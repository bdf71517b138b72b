#!/bin/bash
# Round-4 queue, stage i: feature-set v2 (betting-history features).
#   The leak anatomy (PERF.md) identified TWO diseases: the fold-gate
#   plateau (stage-h's soften experiment) and feature blindness — the
#   20-feature set cannot see street raise counts or the aggressor, so
#   relentless thin value-raising is locally optimal and value-callers
#   farm it (~1.2 bb/hand on every artifact). This stage trains on the
#   24-feature v2 set (indices 20-23: street_raises/4, facing-a-raiser,
#   raiser relative position, re-raised street; engine + kernel parity):
#     es7  — pool-ES from the best 6-max artifact, FULL-parameter
#            perturbation (the appended w1 rows start at zero — a
#            w2/w3-only mask could never learn to read the new inputs),
#            in-loop adaptive CMA attackers now searching the 25-dim
#            v2 rule space.
#     mix7 — the gradient variant (train_mix) from the same start.
#   Both get the honest re-attack (panel probe + CMA optimizer in the
#   v2 attacker space).
#
#   setsid nohup bash scripts/tpu_queue_r4i.sh > logs/tpu_queue_r4i.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4i.pid

stage_h_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue_r4h\.sh( |$)' > /dev/null
}
while ! grep -q "r4h: ALL DONE" logs/tpu_queue_r4h.log 2>/dev/null \
      && stage_h_running; do
  sleep 120
done
echo "r4i: r4h done $(date -u +%H:%M:%S)"

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
    echo "r4i: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r4i: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4i: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff_epoch 2>/dev/null || echo 9999999999)
  if [ "$(date -u +%s)" -ge "$cutoff" ]; then
    echo "r4i: past cutoff epoch $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4i: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4i: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle
  return $rc
}

# ---- 1. es7: v2 features, full-parameter pool-ES with adaptive attackers.
ES7_START=data/policy_6max_es6.npz
[ -f "$ES7_START" ] || ES7_START=data/policy_6max_es5.npz
run_job es7 10800 python scripts/train_es_kernel.py \
  --opponents "data/policy_6max_es3.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt.json:es3,random" \
  --adapt-every 15 --adapt-gens 10 --adapt-popsize 16 \
  --start "$ES7_START" --soften 2 --save data/policy_6max_es7.npz \
  --generations 250 --tables 16384 --steps 256 \
  --sigma 0.05 --lr 0.05
commit_artifacts "es7: feature-set v2 pool-ES (full-parameter, in-loop adaptive)" \
  data/policy_6max_es7.npz

if [ -f data/policy_6max_es7.npz ]; then
  run_job probe_es7 3600 python scripts/exploit_probe.py \
    --subjects es7=data/policy_6max_es7.npz \
    --geometry both --save data/exploitability_es7.json
  commit_artifacts "es7 panel probe (both geometries)" \
    data/exploitability_es7.json
  run_job optbot_es7 7200 python scripts/opt_bot.py \
    --subjects es7=data/policy_6max_es7.npz --pairs 3:0,1:0,3:1:0 \
    --save data/exploitability_opt_es7.json
  commit_artifacts "Adaptive CMA exploitability vs es7 (v2 attacker space)" \
    data/exploitability_opt_es7.json
fi

# ---- 2. mix7: gradient variant on the v2 features.
run_job mix7 7200 python scripts/train_mix.py \
  --seats 6 --start "$ES7_START" --soften 2 \
  --opponents 'optbot:data/exploitability_opt.json:es3%0,self%-0.03,random%3.0' \
  --updates 300 --tables 8192 --lr 1e-3 --max-steps 72 \
  --save data/policy_6max_mix7.npz
commit_artifacts "mix7: gradient hardening on the v2 features" \
  data/policy_6max_mix7.npz

if [ -f data/policy_6max_mix7.npz ]; then
  run_job probe_mix7 3600 python scripts/exploit_probe.py \
    --subjects mix7=data/policy_6max_mix7.npz \
    --geometry both --save data/exploitability_mix7.json
  commit_artifacts "mix7 panel probe" data/exploitability_mix7.json
  run_job optbot_mix7 7200 python scripts/opt_bot.py \
    --subjects mix7=data/policy_6max_mix7.npz --pairs 3:0,1:0 \
    --save data/exploitability_opt_mix7.json
  commit_artifacts "Adaptive CMA exploitability vs mix7" \
    data/exploitability_opt_mix7.json
fi

# ---- 3. recompose the summary with everything present.
PANELS=(data/exploitability.json data/exploitability_hu.json)
for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
         data/exploitability_es4.json data/exploitability_es5.json \
         data/exploitability_es6.json data/exploitability_mix6.json \
         data/exploitability_es7.json data/exploitability_mix7.json; do
  [ -f "$f" ] && PANELS+=("$f")
done
OPTS=()
for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
         data/exploitability_opt_hu_mix.json \
         data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
         data/exploitability_opt_es6.json data/exploitability_opt_mix6.json \
         data/exploitability_opt_es7.json \
         data/exploitability_opt_mix7.json; do
  [ -f "$f" ] && OPTS+=("$f")
done
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json \
  > logs/q_exp_report_r4i.log 2>&1
commit_artifacts "Recompose exploitability summary (v2-feature subjects)" \
  data/exploitability_summary.json

echo "r4i: ALL DONE $(date -u +%H:%M:%S)"
