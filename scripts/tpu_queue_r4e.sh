#!/bin/bash
# Round-4 queue, stage e: the adaptive-training capstone + mop-up.
#   1. es5: pool-ES with IN-LOOP adaptive attackers (--adapt-every) —
#      every 15 generations a fresh CMA attack on the current center
#      replaces the adaptive pool slots (both families, both seat
#      geometries); the per-refresh attacker_bb log is the
#      exploitability trajectory VERDICT #2 asked for.
#   2. honest re-attack on es5 (panel probe + full CMA optimizer).
#   3. server_jax retry (bench_server warmup fix landed after the
#      r4b attempt died on cold-compile socket timeouts).
# Commits every artifact the moment it lands.
#
#   setsid nohup bash scripts/tpu_queue_r4e.sh > logs/tpu_queue_r4e.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4e.pid

stage_d_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue_r4d\.sh( |$)' > /dev/null
}
while ! grep -q "r4d: ALL DONE" logs/tpu_queue_r4d.log 2>/dev/null \
      && stage_d_running; do
  sleep 120
done
echo "r4e: r4d done $(date -u +%H:%M:%S)"

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
    echo "r4e: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r4e: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4e: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff 2>/dev/null || echo 1415)
  if [ "$(date -u +%H%M)" -ge "$cutoff" ]; then
    echo "r4e: past cutoff $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4e: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4e: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle
  return $rc
}

# ---- 1. es5: adaptive attackers in the loop. Start from es4 if it
#         landed, else es3.
ES5_START=data/policy_6max_es3.npz
[ -f data/policy_6max_es4.npz ] && ES5_START=data/policy_6max_es4.npz
run_job es5 10800 python scripts/train_es_kernel.py \
  --opponents "data/policy_6max_es3.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt.json:es3,random" \
  --adapt-every 15 --adapt-gens 10 --adapt-popsize 16 \
  --start "$ES5_START" --save data/policy_6max_es5.npz \
  --generations 200 --tables 16384 --steps 256 \
  --sigma 0.05 --lr 0.05 --mask w2,b2,w3,b3
commit_artifacts "es5: pool-ES with in-loop adaptive CMA attackers" \
  data/policy_6max_es5.npz

if [ -f data/policy_6max_es5.npz ]; then
  run_job probe_es5 3600 python scripts/exploit_probe.py \
    --subjects es5=data/policy_6max_es5.npz \
    --geometry both --save data/exploitability_es5.json
  commit_artifacts "es5 panel probe (both geometries)" \
    data/exploitability_es5.json
  run_job optbot_es5 7200 python scripts/opt_bot.py \
    --subjects es5=data/policy_6max_es5.npz --pairs 3:0,1:0,3:1:0 \
    --save data/exploitability_opt_es5.json
  commit_artifacts "Adaptive CMA exploitability vs es5 (honest re-attack)" \
    data/exploitability_opt_es5.json
fi

# ---- 2. server_jax retry with the warmup fix.
run_job server_jax2 2700 python scripts/bench_server.py --backend jax \
  --rooms 4 --players 3 --actions 100 --save data/server_load_jax.json
commit_artifacts "Interactive server load: jax-backend row" \
  data/server_load_jax.json

# ---- 3. recompose the full exploitability summary.
PANELS=(data/exploitability.json data/exploitability_hu.json)
for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
         data/exploitability_es4.json data/exploitability_es5.json; do
  [ -f "$f" ] && PANELS+=("$f")
done
OPTS=()
for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
         data/exploitability_opt_hu_mix.json \
         data/exploitability_opt_es4.json data/exploitability_opt_es5.json; do
  [ -f "$f" ] && OPTS+=("$f")
done
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json \
  > logs/q_exp_report_r4e.log 2>&1
commit_artifacts "Recompose exploitability summary (es5 + HU subjects)" \
  data/exploitability_summary.json

echo "r4e: ALL DONE $(date -u +%H:%M:%S)"
