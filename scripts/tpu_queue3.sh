#!/bin/bash
# Round-4 TPU job queue, stage 3: runs after scripts/tpu_queue2.sh
# completes. Re-runs the headline bench to validate the steady-state
# equity timing (multi-launch, one sync — the per-launch tunnel
# round-trip was masquerading as a 2x kernel slowdown) on hardware.
#
#   setsid nohup bash scripts/tpu_queue3.sh > logs/tpu_queue3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue3.pid

stage2_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue2\.sh( |$)' > /dev/null
}
while ! grep -q "queue2: ALL DONE" logs/tpu_queue2.log 2>/dev/null \
      && stage2_running; do
  echo "queue3: waiting for stage 2 $(date -u +%H:%M:%S)"
  sleep 120
done
echo "queue3: stage 2 done $(date -u +%H:%M:%S)"

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
    echo "queue3: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
  echo "queue3: tunnel UP $(date -u +%H:%M:%S)"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "queue3: $name already done, skipping"
    return 0
  fi
  wait_tunnel
  echo "queue3: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "queue3: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150
  return $rc
}

run_job bench2 2700 python bench.py

echo "queue3: ALL DONE $(date -u +%H:%M:%S)"
