#!/bin/bash
# Round-4 recovery queue, stage c: measurement mop-up after r4b.
# Regenerates the lost netgrid localization sweep, a bench preview
# (BENCH_r04 fields incl. the net axis), and the full on-hardware
# validate (the league bank-routing fix has never been validated on
# the chip since the VM rebuild).
#
#   setsid nohup bash scripts/tpu_queue_r4c.sh > logs/tpu_queue_r4c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4c.pid

stage_b_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue_r4b\.sh( |$)' > /dev/null
}
while ! grep -q "r4b: ALL DONE" logs/tpu_queue_r4b.log 2>/dev/null \
      && stage_b_running; do
  echo "r4c: waiting for r4b $(date -u +%H:%M:%S)"
  sleep 120
done
echo "r4c: r4b done $(date -u +%H:%M:%S)"

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
    echo "r4c: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4c: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff 2>/dev/null || echo 1415)
  if [ "$(date -u +%H%M)" -ge "$cutoff" ]; then
    echo "r4c: past cutoff $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4c: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4c: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150
  return $rc
}

run_job bench_preview 2700 python bench.py
run_job netgrid 5400 python scripts/exp_net_grid.py
run_job validate_full 3600 python scripts/validate_tpu.py

echo "r4c: ALL DONE $(date -u +%H:%M:%S)"
