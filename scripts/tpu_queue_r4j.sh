#!/bin/bash
# Round-4 queue, stage j: close out the v2-feature experiment + round
# hygiene.
#   1. fold_gate_check on es7/mix7 — did the v2-trained artifacts learn
#      to READ the new aggression features (argmax flip when zeroed) and
#      did the fold gate finally open behaviorally?
#   2. Learned BR vs es7, warm-started from es7's own CMA attacker (the
#      round-4 recipe that took 1.215 bb from es3) — the strongest
#      honest attack family, now in the v2 space.
#   3. Recompose the exploitability summary (BR results auto-globbed).
#   4. validate_tpu — on-hardware kernel agreement AFTER the layout
#      change (last_raiser lane + 24 features).
#   5. bench.py — warms the new-layout compile cache so the driver's
#      round-end bench isn't paying cold compiles; preview committed.
#
#   setsid nohup bash scripts/tpu_queue_r4j.sh > logs/tpu_queue_r4j.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4j.pid

stage_i_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue_r4i\.sh( |$)' > /dev/null
}
while ! grep -q "r4i: ALL DONE" logs/tpu_queue_r4i.log 2>/dev/null \
      && stage_i_running; do
  sleep 120
done
echo "r4j: r4i done $(date -u +%H:%M:%S)"

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
    echo "r4j: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r4j: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4j: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff_epoch_j 2>/dev/null || echo 9999999999)
  if [ "$(date -u +%s)" -ge "$cutoff" ]; then
    echo "r4j: past cutoff epoch $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4j: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4j: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle
  return $rc
}

# ---- 1. Round hygiene FIRST (must-haves): on-hardware kernel
# agreement after the layout change, then the headline bench to warm
# the driver's compile cache for the new shapes.
run_job validate7 5400 python scripts/validate_tpu.py
commit_artifacts "validate_tpu log after feature-v2 layout change" \
  logs/q_validate7.log

run_job bench7 5400 python bench.py
if [ -f logs/q_bench7.log ]; then
  tail -1 logs/q_bench7.log > data/bench_r4_preview.json 2>/dev/null || true
  commit_artifacts "bench preview after feature-v2 (warms the driver's cache)" \
    data/bench_r4_preview.json
fi

# ---- 2. v2-usage + fold-gate diagnostic (CPU path).
SUBJ=""
[ -f data/policy_6max_es7.npz ] && SUBJ="es7=data/policy_6max_es7.npz"
if [ -f data/policy_6max_mix7.npz ]; then
  [ -n "$SUBJ" ] && SUBJ="$SUBJ,"
  SUBJ="${SUBJ}mix7=data/policy_6max_mix7.npz"
fi
if [ -n "$SUBJ" ]; then
  run_job foldgate7 1800 python scripts/fold_gate_check.py \
    --subjects "$SUBJ" --save data/fold_gate_es7.json
  commit_artifacts "fold-gate + v2-usage diagnostic for the v2-trained artifacts" \
    data/fold_gate_es7.json
fi

# ---- 3. learned BR vs es7 from its own CMA attacker.
if [ -f data/policy_6max_es7.npz ] && [ -f data/exploitability_opt_es7.json ]; then
  run_job br_es7 7200 python scripts/train_br.py \
    --opponent es7=data/policy_6max_es7.npz \
    --start optbot:data/exploitability_opt_es7.json:es7 --soften 50 \
    --updates 400 --tables 4096 --resume \
    --save data/br_vs_es7_cma.npz
  commit_artifacts "Learned BR vs es7, warm-started from its CMA attacker" \
    data/br_vs_es7_cma.npz data/br_vs_es7_cma.npz.result.json
fi

# ---- 4. HU v2 un-freeze: the HU line is behaviorally FROZEN (leak
# anatomy: hu300 margins ~15, P(non-argmax) 1.5e-6, fold LAST on 100%).
# Cure under test = the same v2 recipe: soften 8 (fold into the
# exploration band) + gradient training with the aggression features
# live, vs {its CMA attacker, self anchor, random}; honest re-attack.
run_job hu7 7200 python scripts/train_mix.py \
  --seats 2 --start data/policy_hu_300.npz --soften 8 \
  --opponents 'optbot:data/exploitability_opt_hu.json:hu%0,self%-0.03,random%1.5' \
  --updates 300 --tables 8192 --lr 1e-3 --max-steps 24 \
  --save data/policy_hu7.npz
commit_artifacts "hu7: v2-feature gradient un-freeze of the HU line" \
  data/policy_hu7.npz

if [ -f data/policy_hu7.npz ]; then
  run_job foldgate_hu7 1800 python scripts/fold_gate_check.py \
    --subjects hu7=data/policy_hu7.npz --save data/fold_gate_hu7.json
  commit_artifacts "hu7 fold-gate + v2-usage diagnostic" \
    data/fold_gate_hu7.json
  run_job probe_hu7 3600 python scripts/exploit_probe.py \
    --subjects hu7=data/policy_hu7.npz \
    --geometry both --save data/exploitability_hu7.json
  commit_artifacts "hu7 panel probe" data/exploitability_hu7.json
  run_job optbot_hu7 7200 python scripts/opt_bot.py \
    --subjects hu7=data/policy_hu7.npz --pairs 3:0,1:0 \
    --save data/exploitability_opt_hu7.json
  commit_artifacts "Adaptive CMA exploitability vs hu7" \
    data/exploitability_opt_hu7.json
fi

# ---- 5. summary recompose (BR globbed automatically).
PANELS=(data/exploitability.json data/exploitability_hu.json)
for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
         data/exploitability_es4.json data/exploitability_es5.json \
         data/exploitability_es6.json data/exploitability_mix6.json \
         data/exploitability_es7.json data/exploitability_mix7.json \
         data/exploitability_hu7.json; do
  [ -f "$f" ] && PANELS+=("$f")
done
OPTS=()
for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
         data/exploitability_opt_hu_mix.json \
         data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
         data/exploitability_opt_es6.json data/exploitability_opt_mix6.json \
         data/exploitability_opt_es7.json \
         data/exploitability_opt_mix7.json \
         data/exploitability_opt_hu7.json; do
  [ -f "$f" ] && OPTS+=("$f")
done
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json \
  > logs/q_exp_report_r4j.log 2>&1
commit_artifacts "Recompose exploitability summary (learned BR vs es7)" \
  data/exploitability_summary.json

echo "r4j: ALL DONE $(date -u +%H:%M:%S)"
