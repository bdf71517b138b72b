#!/bin/bash
# Round-4 TPU job queue, stage 6 (conditional): runs after stage 5.
# If the CMA attack on es4 (stage 2) still extracts > 0.25 bb/hand,
# train es5 with the DISCOVERED attacker in the pool (optbot: spec,
# both geometries), then probe + CMA-attack es5 and re-compose the
# exploitability summary. Every job is gated on a wall-clock cutoff so
# stage 6 cannot still hold the chip when the round's driver bench runs.
#
#   setsid nohup bash scripts/tpu_queue6.sh > logs/tpu_queue6.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue6.pid

CUTOFF=1445   # UTC HHMM: no new chip job starts after this

stage5_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue5\.sh( |$)' > /dev/null
}
while ! grep -q "queue5: ALL DONE" logs/tpu_queue5.log 2>/dev/null \
      && stage5_running; do
  echo "queue6: waiting for stage 5 $(date -u +%H:%M:%S)"
  sleep 120
done
echo "queue6: stage 5 done $(date -u +%H:%M:%S)"

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
    echo "queue6: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
  echo "queue6: tunnel UP $(date -u +%H:%M:%S)"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "queue6: $name already done, skipping"
    return 0
  fi
  if [ "$(date -u +%H%M)" -ge "$CUTOFF" ]; then
    echo "queue6: past cutoff $CUTOFF, skipping $name"
    return 1
  fi
  wait_tunnel
  echo "queue6: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "queue6: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150
  return $rc
}

OPT4=data/exploitability_opt_es4.json
NEED_ES5=$(python - <<'EOF'
import json, os
p = "data/exploitability_opt_es4.json"
try:
    lb = json.load(open(p))["subjects"]["es4"]["adaptive_bot_lb_bb"]
    print("yes" if lb > 0.25 else "no")
except Exception:
    print("missing")
EOF
)
echo "queue6: es5 needed = $NEED_ES5"

if [ "$NEED_ES5" = "yes" ] && [ -f data/policy_6max_es4.npz ]; then
  run_job es5 6000 python scripts/train_es_kernel.py \
    --opponents "data/policy_6max_es4.npz,optbot:${OPT4}:es4,optbot:${OPT4}:es4@lone,bot:jam_loose,random" \
    --start data/policy_6max_es4.npz --save data/policy_6max_es5.npz \
    --generations 150 --tables 16384 --steps 256 \
    --sigma 0.05 --lr 0.05 --mask w2,b2,w3,b3

  if [ -f data/policy_6max_es5.npz ]; then
    run_job probe_es5 3600 python scripts/exploit_probe.py \
      --subjects es5=data/policy_6max_es5.npz --geometry both \
      --save data/exploitability_es5.json
    run_job optbot_es5 5400 python scripts/opt_bot.py \
      --subjects es5=data/policy_6max_es5.npz --pairs 3:0,3:1:0 \
      --save data/exploitability_opt_es5.json
    run_job exp_report2 600 python scripts/exploitability_report.py \
      --panel data/exploitability.json data/exploitability_hu.json \
              data/exploitability_es4.json data/exploitability_hu_es.json \
              data/exploitability_es5.json \
      --opt data/exploitability_opt.json data/exploitability_opt_es4.json \
            data/exploitability_opt_es5.json \
      --save data/exploitability_summary.json
  fi
fi

echo "queue6: ALL DONE $(date -u +%H:%M:%S)"
