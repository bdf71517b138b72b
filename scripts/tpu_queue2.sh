#!/bin/bash
# Round-4 TPU job queue, stage 2: runs after scripts/tpu_queue.sh
# completes (waits on its pid). Adds the adaptive CMA attack against
# the freshly-trained es4 artifact and composes the final
# max(panel, adaptive bot, learned BR) exploitability summary.
#
#   setsid nohup bash scripts/tpu_queue2.sh > logs/tpu_queue2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue2.pid

# Wait for stage 1 (ONE chip job at a time — CLAUDE.md). Done when its
# log says ALL DONE, or when no stage-1 process is alive (finished or
# crashed; either way the chip is free). The process check does not
# trust /tmp pid files alone (missing/stale/recycled pids race).
stage1_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue\.sh( |$)' > /dev/null
}
while ! grep -q "queue: ALL DONE" logs/tpu_queue.log 2>/dev/null \
      && stage1_running; do
  echo "queue2: waiting for stage 1 $(date -u +%H:%M:%S)"
  sleep 120
done
echo "queue2: stage 1 done $(date -u +%H:%M:%S)"

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
    echo "queue2: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
  echo "queue2: tunnel UP $(date -u +%H:%M:%S)"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "queue2: $name already done, skipping"
    return 0
  fi
  wait_tunnel
  echo "queue2: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "queue2: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150
  return $rc
}

# 9. Adaptive CMA attack on es4 (the artifact stage 1 trains). The
#    3-spec menu keeps it inside one tunnel session; partial saves
#    survive the timeout.
if [ -f data/policy_6max_es4.npz ]; then
  run_job optbot_es4 10800 python scripts/opt_bot.py \
    --subjects es4=data/policy_6max_es4.npz \
    --pairs 3:0,1:0,3:1:0 \
    --save data/exploitability_opt_es4.json
else
  echo "queue2: es4 artifact missing, skipping optbot_es4"
fi

# 9b. River Nash-gap for the new artifacts (CPU-only script — no
#     tunnel needed; run_job's wait_tunnel is skipped via direct call).
RG_SUBJECTS=()
[ -f data/policy_6max_es4.npz ] && RG_SUBJECTS+=("es4=data/policy_6max_es4.npz")
[ -f data/policy_hu_es.npz ] && RG_SUBJECTS+=("hu_es=data/policy_hu_es.npz")
if [ ${#RG_SUBJECTS[@]} -gt 0 ] \
    && ! { [ -f logs/q_rivergap_r4.rc ] && [ "$(cat logs/q_rivergap_r4.rc)" = 0 ]; }; then
  echo "queue2: START rivergap_r4 $(date -u +%H:%M:%S)"
  timeout 7200 python scripts/river_gap.py --subjects "${RG_SUBJECTS[@]}" \
    --save data/river_gap_r4.json > logs/q_rivergap_r4.log 2>&1
  echo "$?" > logs/q_rivergap_r4.rc
  echo "queue2: DONE rivergap_r4 rc=$(cat logs/q_rivergap_r4.rc)"
fi

# 9c. Two-street (turn+river) Nash gap on the chip: pure-XLA mat-ops,
#     ~6 GB of [C,C] panel traffic per CFR+ iteration — bandwidth-bound,
#     so the v5e runs in minutes what the single-core CPU needs hours
#     for. Includes the new artifacts when stage 1 produced them.
TG_SUBJECTS=(es3=data/policy_6max_es3.npz es2=data/policy_6max_es2.npz
  reinforce=data/policy_6max_200.npz hu=data/policy_hu_300.npz
  untrained=INIT)
[ -f data/policy_6max_es4.npz ] && TG_SUBJECTS+=("es4=data/policy_6max_es4.npz")
[ -f data/policy_hu_es.npz ] && TG_SUBJECTS+=("hu_es=data/policy_hu_es.npz")
run_job turngap_tpu 7200 env TURN_GAP_TPU=1 python scripts/turn_gap.py \
  --iterations 4000 --subjects "${TG_SUBJECTS[@]}" \
  --save data/turn_gap.json

# 10. Compose the honest per-artifact exploitability statement
#     (host-side JSON merge; tolerant of missing inputs).
run_job exp_report 600 python scripts/exploitability_report.py \
  --panel data/exploitability.json data/exploitability_hu.json \
          data/exploitability_es4.json data/exploitability_hu_es.json \
  --opt data/exploitability_opt.json data/exploitability_opt_es4.json \
  --save data/exploitability_summary.json

echo "queue2: ALL DONE $(date -u +%H:%M:%S)"
