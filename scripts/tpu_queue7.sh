#!/bin/bash
# Round-4 TPU job queue, stage 7: runs after stage 6. Mop-up jobs, each
# cutoff-gated so the chip is free for the round-end driver bench:
#  - br2_es3: learned BR warm-started from the CMA attacker (the flat
#    pretrained start went nowhere: +0.01 bb; the CMA start begins at
#    ~1.2 and lets REINFORCE ascend from there),
#  - server_jax: the jax-backend row of the interactive-server table,
#  - exp_report3: final exploitability summary recompose.
#
#   setsid nohup bash scripts/tpu_queue7.sh > logs/tpu_queue7.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue7.pid

CUTOFF=1500   # UTC HHMM: no new chip job starts after this

stage6_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue6\.sh( |$)' > /dev/null
}
while ! grep -q "queue6: ALL DONE" logs/tpu_queue6.log 2>/dev/null \
      && stage6_running; do
  echo "queue7: waiting for stage 6 $(date -u +%H:%M:%S)"
  sleep 120
done
echo "queue7: stage 6 done $(date -u +%H:%M:%S)"

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
    echo "queue7: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
  echo "queue7: tunnel UP $(date -u +%H:%M:%S)"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "queue7: $name already done, skipping"
    return 0
  fi
  if [ "$(date -u +%H%M)" -ge "$CUTOFF" ]; then
    echo "queue7: past cutoff $CUTOFF, skipping $name"
    return 1
  fi
  wait_tunnel
  echo "queue7: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "queue7: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150
  return $rc
}

run_job br2_es3 3000 python scripts/train_br.py \
  --opponent es3=data/policy_6max_es3.npz \
  --start optbot:data/exploitability_opt.json:es3 --soften 50 \
  --lr 1e-3 --updates 400 --save data/br_vs_es3_cma.npz

# HU hardening retry: the first run froze at the noise floor (spread
# 0.0002 bb with sigma 0.05 over ALL params — the saturated HU net
# needs bigger kicks on the output layer to change any argmax).
run_job hu_es2 5400 python scripts/train_es_kernel.py \
  --seats 2 --opponents bot:fof_raise,bot:fof_raise@lone,random \
  --start data/policy_hu_300.npz --save data/policy_hu_es.npz \
  --generations 150 --tables 16384 --steps 256 \
  --sigma 0.4 --lr 0.1 --mask w3,b3

run_job probe_hu2 3600 python scripts/exploit_probe.py \
  --seats 2 --subjects hu_es=data/policy_hu_es.npz \
  hu=data/policy_hu_300.npz --geometry both \
  --save data/exploitability_hu_es.json

OPT_HU_SUBJECTS=()
[ -f data/policy_hu_es.npz ] && OPT_HU_SUBJECTS+=("hu_es=data/policy_hu_es.npz")
OPT_HU_SUBJECTS+=("hu=data/policy_hu_300.npz")
run_job optbot_hu 5400 python scripts/opt_bot.py --seats 2 \
  --subjects "${OPT_HU_SUBJECTS[@]}" --pairs 3:0,1:0 \
  --save data/exploitability_opt_hu.json

run_job server_jax 2700 python scripts/bench_server.py --backend jax \
  --rooms 4 --players 3 --actions 100 --save data/server_load_jax.json

PANELS=(data/exploitability.json data/exploitability_hu.json)
[ -f data/exploitability_es4.json ] && PANELS+=(data/exploitability_es4.json)
[ -f data/exploitability_hu_es.json ] && PANELS+=(data/exploitability_hu_es.json)
[ -f data/exploitability_es5.json ] && PANELS+=(data/exploitability_es5.json)
OPTS=(data/exploitability_opt.json)
[ -f data/exploitability_opt_hu.json ] && OPTS+=(data/exploitability_opt_hu.json)
[ -f data/exploitability_opt_es4.json ] && OPTS+=(data/exploitability_opt_es4.json)
[ -f data/exploitability_opt_es5.json ] && OPTS+=(data/exploitability_opt_es5.json)
echo "queue7: START exp_report3 $(date -u +%H:%M:%S)"
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json > logs/q_exp_report3.log 2>&1
echo "$?" > logs/q_exp_report3.rc
echo "queue7: DONE exp_report3 rc=$(cat logs/q_exp_report3.rc)"

echo "queue7: ALL DONE $(date -u +%H:%M:%S)"
