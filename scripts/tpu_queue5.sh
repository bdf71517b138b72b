#!/bin/bash
# Round-4 TPU job queue, stage 5: runs after scripts/tpu_queue4.sh
# completes. Re-runs the net validate section after the league
# bank-routing check was fixed to reference rules.
#
#   setsid nohup bash scripts/tpu_queue5.sh > logs/tpu_queue5.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue5.pid

stage4_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue3\.sh( |$)' > /dev/null
}
while ! grep -q "queue4: ALL DONE" logs/tpu_queue4.log 2>/dev/null \
      && stage4_running; do
  echo "queue5: waiting for stage 4 $(date -u +%H:%M:%S)"
  sleep 120
done
echo "queue5: stage 4 done $(date -u +%H:%M:%S)"

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
    echo "queue5: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
  echo "queue5: tunnel UP $(date -u +%H:%M:%S)"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "queue5: $name already done, skipping"
    return 0
  fi
  wait_tunnel
  echo "queue5: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "queue5: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150
  return $rc
}

run_job validate_net2 3600 python scripts/validate_tpu.py --only net

echo "queue5: ALL DONE $(date -u +%H:%M:%S)"
