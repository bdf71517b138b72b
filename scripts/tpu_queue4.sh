#!/bin/bash
# Round-4 TPU job queue, stage 4: runs after scripts/tpu_queue3.sh
# completes. Runs the net-kernel grid-cost sweep (exp_net_grid.py) to
# localize the ~9 ns net-step vs ~2 ns engine-step gap (VERDICT r3 #3).
#
#   setsid nohup bash scripts/tpu_queue4.sh > logs/tpu_queue4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue4.pid

stage3_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue3\.sh( |$)' > /dev/null
}
while ! grep -q "queue3: ALL DONE" logs/tpu_queue3.log 2>/dev/null \
      && stage3_running; do
  echo "queue4: waiting for stage 3 $(date -u +%H:%M:%S)"
  sleep 120
done
echo "queue4: stage 3 done $(date -u +%H:%M:%S)"

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
    echo "queue4: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
  echo "queue4: tunnel UP $(date -u +%H:%M:%S)"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "queue4: $name already done, skipping"
    return 0
  fi
  wait_tunnel
  echo "queue4: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "queue4: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150
  return $rc
}

run_job netgrid 5400 python scripts/exp_net_grid.py

echo "queue4: ALL DONE $(date -u +%H:%M:%S)"
