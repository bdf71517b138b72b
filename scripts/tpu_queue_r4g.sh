#!/bin/bash
# Round-4 queue, stage g: the HU un-freeze experiment.
#   Leak anatomy (PERF.md) measured policy_hu_300 behaviorally FROZEN:
#   margins p50=15.4 => P(non-argmax)=1.5e-6 (no REINFORCE exploration)
#   and 0.0% of decisions flippable by the production ES recipe — which
#   mechanically explains both failed HU hardening attempts. The cure
#   under test: soften the start (w3,b3)/8 -> ~22% exploration, then
#   gradient-harden vs {fof_raise, self(=original hu300), random} with
#   min-slack holdout selection, and re-attack the result honestly
#   (panel probe + CMA optimizer).
#
#   setsid nohup bash scripts/tpu_queue_r4g.sh > logs/tpu_queue_r4g.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4g.pid

stage_f_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue_r4f\.sh( |$)' > /dev/null
}
while ! grep -q "r4f: ALL DONE" logs/tpu_queue_r4f.log 2>/dev/null \
      && stage_f_running; do
  sleep 120
done
echo "r4g: r4f done $(date -u +%H:%M:%S)"

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
    echo "r4g: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r4g: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4g: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff_epoch 2>/dev/null || echo 9999999999)
  if [ "$(date -u +%s)" -ge "$cutoff" ]; then
    echo "r4g: past cutoff epoch $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4g: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4g: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle
  return $rc
}

# ---- 1. soften + gradient-harden HU.
run_job hu_soft 7200 python scripts/train_mix.py \
  --seats 2 --start data/policy_hu_300.npz --soften 8 \
  --opponents 'bot:fof_raise%0,self%-0.03,random%1.8' \
  --updates 600 --tables 8192 --lr 1e-3 \
  --save data/policy_hu_soft.npz
commit_artifacts "HU un-freeze: soften/8 + gradient hardening artifact" \
  data/policy_hu_soft.npz

# ---- 2. honest re-attack.
if [ -f data/policy_hu_soft.npz ]; then
  run_job probe_hu_soft 3600 python scripts/exploit_probe.py \
    --seats 2 --subjects hu_soft=data/policy_hu_soft.npz \
    --geometry both --save data/exploitability_hu_soft.json
  commit_artifacts "HU softened artifact panel probe" \
    data/exploitability_hu_soft.json
  run_job optbot_hu_soft 7200 python scripts/opt_bot.py \
    --seats 2 --subjects hu_soft=data/policy_hu_soft.npz \
    --pairs 3:0,1:0 --save data/exploitability_opt_hu_soft.json
  commit_artifacts "Adaptive CMA exploitability vs the HU softened artifact" \
    data/exploitability_opt_hu_soft.json
fi

# ---- 3. recompose the summary with every artifact present.
PANELS=(data/exploitability.json data/exploitability_hu.json)
for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
         data/exploitability_hu_soft.json \
         data/exploitability_es4.json data/exploitability_es5.json; do
  [ -f "$f" ] && PANELS+=("$f")
done
OPTS=()
for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
         data/exploitability_opt_hu_mix.json \
         data/exploitability_opt_hu_soft.json \
         data/exploitability_opt_es4.json data/exploitability_opt_es5.json; do
  [ -f "$f" ] && OPTS+=("$f")
done
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json \
  > logs/q_exp_report_r4g.log 2>&1
commit_artifacts "Recompose exploitability summary (HU softened subject)" \
  data/exploitability_summary.json

echo "r4g: ALL DONE $(date -u +%H:%M:%S)"
