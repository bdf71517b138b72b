#!/bin/bash
# Round-4 queue, stage f: finish what the seed-overflow crash cut short.
#   The r4e es5 run died at gen 15 — the FIRST in-loop adaptive refresh
#   (int32 seed overflow in quick_attack -> run_net_eval_pop, fixed by
#   masking chunk seeds to 31 bits). The committed es5 never actually
#   trained against refreshed attackers. Resume it to 200 generations,
#   re-attack honestly, rerun the validate tail (np NameError fixed) and
#   a full bench line, then recompose the summary.
# Commits every artifact the moment it lands.
#
#   setsid nohup bash scripts/tpu_queue_r4f.sh > logs/tpu_queue_r4f.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4f.pid

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
x = jnp.ones((128, 128))
print(int((x @ x)[0, 0]))
EOF
}

wait_tunnel() {
  local n=0
  while ! probe; do
    n=$((n + 1))
    echo "r4f: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
}

commit_artifacts() {  # msg paths...
  local msg="$1"; shift
  local have=()
  for p in "$@"; do [ -f "$p" ] && have+=("$p"); done
  [ ${#have[@]} -eq 0 ] && return 0
  git add "${have[@]}" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$msg"
  echo "r4f: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4f: $name already done, skipping"
    return 0
  fi
  # epoch-seconds cutoff (the HHMM scheme broke across midnight)
  local cutoff; cutoff=$(cat /tmp/q_cutoff_epoch 2>/dev/null || echo 9999999999)
  if [ "$(date -u +%s)" -ge "$cutoff" ]; then
    echo "r4f: past cutoff epoch $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4f: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4f: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle
  return $rc
}

# ---- 1. es5: resume from the gen-11 checkpoint, adaptive refreshes now
#         survive the seed masking fix.
run_job es5r 10800 python scripts/train_es_kernel.py \
  --opponents "data/policy_6max_es3.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt.json:es3,random" \
  --adapt-every 15 --adapt-gens 10 --adapt-popsize 16 \
  --start data/policy_6max_es4.npz --resume \
  --save data/policy_6max_es5.npz \
  --generations 200 --tables 16384 --steps 256 \
  --sigma 0.05 --lr 0.05 --mask w2,b2,w3,b3
commit_artifacts "es5 resumed to 200 gens: in-loop adaptive refreshes live" \
  data/policy_6max_es5.npz

# ---- 2. honest re-attack on the finished es5.
run_job probe_es5r 3600 python scripts/exploit_probe.py \
  --subjects es5=data/policy_6max_es5.npz \
  --geometry both --save data/exploitability_es5.json
commit_artifacts "es5 (full run) panel probe, both geometries" \
  data/exploitability_es5.json
run_job optbot_es5r 7200 python scripts/opt_bot.py \
  --subjects es5=data/policy_6max_es5.npz --pairs 3:0,1:0,3:1:0 \
  --save data/exploitability_opt_es5.json
commit_artifacts "Adaptive CMA exploitability vs the full es5" \
  data/exploitability_opt_es5.json

# ---- 3. validate tail rerun (np NameError in equity_vs_hand_pallas fixed).
run_job validate_r4f 5400 python scripts/validate_tpu.py
# ---- 4. full bench line (confirms the driver's round-end artifact shape).
run_job bench_r4f 3600 python bench.py

# ---- 5. recompose the exploitability summary with the final es5 rows.
PANELS=(data/exploitability.json data/exploitability_hu.json)
for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
         data/exploitability_es4.json data/exploitability_es5.json; do
  [ -f "$f" ] && PANELS+=("$f")
done
OPTS=()
for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
         data/exploitability_opt_hu_mix.json \
         data/exploitability_opt_es4.json data/exploitability_opt_es5.json; do
  [ -f "$f" ] && OPTS+=("$f")
done
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json \
  > logs/q_exp_report_r4f.log 2>&1
commit_artifacts "Recompose exploitability summary (full es5)" \
  data/exploitability_summary.json

echo "r4f: ALL DONE $(date -u +%H:%M:%S)"
