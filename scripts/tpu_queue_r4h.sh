#!/bin/bash
# Round-4 queue, stage h: the 6-max un-freeze experiment.
#   The fold-gate diagnostic (PERF.md) showed every 6-max artifact is a
#   never-fold station and that fold learning is plateau-locked for
#   both ES and REINFORCE (P(fold) ~ 1e-7..1e-13 => no gradient, no
#   fitness signal). Cure under test: soften the start (w3,b3)/6 so
#   fold enters the exploration band, then
#     es6  — pool-ES with in-loop adaptive CMA attackers (the es5
#            recipe, now with a live fold gate), and
#     mix6 — the gradient variant (train_mix, min-slack holdout) vs
#            {the discovered CMA attacker, self(=es3 anchor), random}.
#   Both get the honest re-attack (panel probe + CMA optimizer).
#
#   setsid nohup bash scripts/tpu_queue_r4h.sh > logs/tpu_queue_r4h.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4h.pid

stage_g_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue_r4g\.sh( |$)' > /dev/null
}
while ! grep -q "r4g: ALL DONE" logs/tpu_queue_r4g.log 2>/dev/null \
      && stage_g_running; do
  sleep 120
done
echo "r4h: r4g done $(date -u +%H:%M:%S)"

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
    echo "r4h: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r4h: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4h: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff_epoch 2>/dev/null || echo 9999999999)
  if [ "$(date -u +%s)" -ge "$cutoff" ]; then
    echo "r4h: past cutoff epoch $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4h: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4h: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle
  return $rc
}

# ---- 1. es6: softened start, in-loop adaptive pool-ES.
ES6_START=data/policy_6max_es5.npz
[ -f "$ES6_START" ] || ES6_START=data/policy_6max_es4.npz
run_job es6 10800 python scripts/train_es_kernel.py \
  --opponents "data/policy_6max_es3.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt.json:es3,random" \
  --adapt-every 15 --adapt-gens 10 --adapt-popsize 16 \
  --start "$ES6_START" --soften 6 --save data/policy_6max_es6.npz \
  --generations 250 --tables 16384 --steps 256 \
  --sigma 0.05 --lr 0.05 --mask w2,b2,w3,b3
commit_artifacts "es6: fold gate opened (soften/6) + in-loop adaptive pool-ES" \
  data/policy_6max_es6.npz

if [ -f data/policy_6max_es6.npz ]; then
  run_job probe_es6 3600 python scripts/exploit_probe.py \
    --subjects es6=data/policy_6max_es6.npz \
    --geometry both --save data/exploitability_es6.json
  commit_artifacts "es6 panel probe (both geometries)" \
    data/exploitability_es6.json
  run_job optbot_es6 7200 python scripts/opt_bot.py \
    --subjects es6=data/policy_6max_es6.npz --pairs 3:0,1:0,3:1:0 \
    --save data/exploitability_opt_es6.json
  commit_artifacts "Adaptive CMA exploitability vs es6" \
    data/exploitability_opt_es6.json
fi

# ---- 2. mix6: the gradient variant from the same softened start.
run_job mix6 7200 python scripts/train_mix.py \
  --seats 6 --start data/policy_6max_es5.npz --soften 6 \
  --opponents 'optbot:data/exploitability_opt.json:es3%0,self%-0.03,random%3.0' \
  --updates 300 --tables 8192 --lr 1e-3 --max-steps 72 \
  --save data/policy_6max_mix.npz
commit_artifacts "mix6: gradient hardening from the softened start" \
  data/policy_6max_mix.npz

if [ -f data/policy_6max_mix.npz ]; then
  run_job probe_mix6 3600 python scripts/exploit_probe.py \
    --subjects mix6=data/policy_6max_mix.npz \
    --geometry both --save data/exploitability_mix6.json
  commit_artifacts "mix6 panel probe" data/exploitability_mix6.json
  run_job optbot_mix6 7200 python scripts/opt_bot.py \
    --subjects mix6=data/policy_6max_mix.npz --pairs 3:0,1:0 \
    --save data/exploitability_opt_mix6.json
  commit_artifacts "Adaptive CMA exploitability vs mix6" \
    data/exploitability_opt_mix6.json
fi

# ---- 3. recompose the summary with everything present.
PANELS=(data/exploitability.json data/exploitability_hu.json)
for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
         data/exploitability_hu_soft.json data/exploitability_es4.json \
         data/exploitability_es5.json data/exploitability_es6.json \
         data/exploitability_mix6.json; do
  [ -f "$f" ] && PANELS+=("$f")
done
OPTS=()
for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
         data/exploitability_opt_hu_mix.json \
         data/exploitability_opt_hu_soft.json \
         data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
         data/exploitability_opt_es6.json \
         data/exploitability_opt_mix6.json; do
  [ -f "$f" ] && OPTS+=("$f")
done
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json \
  > logs/q_exp_report_r4h.log 2>&1
commit_artifacts "Recompose exploitability summary (un-freeze subjects)" \
  data/exploitability_summary.json

echo "r4h: ALL DONE $(date -u +%H:%M:%S)"
