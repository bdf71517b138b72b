#!/bin/bash
# Round-4 recovery queue: the VM hosting rounds 1-7 of the original
# stage queue was rebuilt, wiping every uncommitted artifact the chip
# jobs had produced (exploitability_opt.json, exploitability_summary.json,
# turn_gap.json, policy_hu_es.npz, es4, server_load_jax.json). This
# queue re-runs them in priority order — committed-claim artifacts
# first — and `git commit`s each artifact the moment it lands so a
# reset cannot lose them again.
#
#   setsid nohup bash scripts/tpu_queue_r4b.sh > logs/tpu_queue_r4b.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4b.pid

# Cutoff is a FILE so the operator can extend it live as the round-end
# estimate firms up. No new chip job starts after this UTC HHMM.
echo 1415 > /tmp/q_cutoff

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
    echo "r4b: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r4b: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4b: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff 2>/dev/null || echo 1415)
  if [ "$(date -u +%H%M)" -ge "$cutoff" ]; then
    echo "r4b: past cutoff $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4b: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4b: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle (kill mid-run can wedge ~2 min)
  return $rc
}

recompose() {  # regenerate the summary from whatever inputs exist
  local PANELS=(data/exploitability.json data/exploitability_hu.json)
  [ -f data/exploitability_es4.json ] && PANELS+=(data/exploitability_es4.json)
  [ -f data/exploitability_hu_es.json ] && PANELS+=(data/exploitability_hu_es.json)
  local OPTS=()
  [ -f data/exploitability_opt.json ] && OPTS+=(data/exploitability_opt.json)
  [ -f data/exploitability_opt_hu.json ] && OPTS+=(data/exploitability_opt_hu.json)
  [ -f data/exploitability_opt_es4.json ] && OPTS+=(data/exploitability_opt_es4.json)
  [ ${#OPTS[@]} -eq 0 ] && return 0
  timeout 600 python scripts/exploitability_report.py \
    --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
    --save data/exploitability_summary.json \
    > logs/q_exp_report_r4b.log 2>&1
  commit_artifacts "Recompose exploitability summary" \
    data/exploitability_summary.json
}

# ---- 1. Adaptive CMA exploitability vs es3 + es2 (backs the PERF
#         round-4 headline table; the artifact PERF cites was lost).
run_job optbot 5400 python scripts/opt_bot.py \
  --subjects es3=data/policy_6max_es3.npz es2=data/policy_6max_es2.npz \
  --save data/exploitability_opt.json
commit_artifacts "Regenerate adaptive CMA exploitability artifact (es3, es2)" \
  data/exploitability_opt.json
recompose

# ---- 2. Two-street Nash gap on the chip (README cites turn_gap.json).
run_job turngap 5400 env TURN_GAP_TPU=1 python scripts/turn_gap.py \
  --iterations 4000 --save data/turn_gap.json
commit_artifacts "Regenerate two-street (turn+river) Nash-gap artifact" \
  data/turn_gap.json

# ---- 3. HU hardening (stage-7 recipe: output-layer kicks) + probes.
run_job hu_es 5400 python scripts/train_es_kernel.py \
  --seats 2 --opponents bot:fof_raise,bot:fof_raise@lone,random \
  --start data/policy_hu_300.npz --save data/policy_hu_es.npz \
  --generations 150 --tables 16384 --steps 256 \
  --sigma 0.4 --lr 0.1 --mask w3,b3
commit_artifacts "HU hardened artifact (pool-ES vs fof_raise, output-layer kicks)" \
  data/policy_hu_es.npz

if [ -f data/policy_hu_es.npz ]; then
  run_job probe_hu 3600 python scripts/exploit_probe.py \
    --seats 2 --subjects hu_es=data/policy_hu_es.npz \
    hu=data/policy_hu_300.npz --geometry both \
    --save data/exploitability_hu_es.json
  commit_artifacts "HU hardened artifact panel probe" \
    data/exploitability_hu_es.json
  run_job optbot_hu 4800 python scripts/opt_bot.py --seats 2 \
    --subjects hu_es=data/policy_hu_es.npz hu=data/policy_hu_300.npz \
    --pairs 3:0,1:0 --save data/exploitability_opt_hu.json
  commit_artifacts "Adaptive CMA exploitability, HU artifacts" \
    data/exploitability_opt_hu.json
  recompose
fi

# ---- 4. Interactive-server jax-backend row (PERF table gap).
run_job server_jax 2700 python scripts/bench_server.py --backend jax \
  --rooms 4 --players 3 --actions 100 --save data/server_load_jax.json
commit_artifacts "Interactive server load: jax-backend row" \
  data/server_load_jax.json

# ---- 5. es4: pool-ES with the CMA attacker in the pool (verdict #2).
#         Only if the cutoff allows a full training run.
if [ -f data/exploitability_opt.json ]; then
  run_job es4 9000 python scripts/train_es_kernel.py \
    --opponents "data/policy_6max_es3.npz,optbot:data/exploitability_opt.json:es3,optbot:data/exploitability_opt.json:es3@lone,bot:jam_loose,random" \
    --start data/policy_6max_es3.npz --save data/policy_6max_es4.npz \
    --generations 200 --tables 16384 --steps 256 \
    --sigma 0.05 --lr 0.05 --mask w2,b2,w3,b3
  commit_artifacts "es4: pool-ES trained against the discovered CMA attacker" \
    data/policy_6max_es4.npz
fi

if [ -f data/policy_6max_es4.npz ]; then
  run_job probe_es4 3600 python scripts/exploit_probe.py \
    --subjects es4=data/policy_6max_es4.npz es3=data/policy_6max_es3.npz \
    --geometry both --save data/exploitability_es4.json
  commit_artifacts "es4 panel probe (both geometries)" \
    data/exploitability_es4.json
  run_job optbot_es4 7200 python scripts/opt_bot.py \
    --subjects es4=data/policy_6max_es4.npz --pairs 3:0,1:0,3:1:0 \
    --save data/exploitability_opt_es4.json
  commit_artifacts "Adaptive CMA exploitability vs es4" \
    data/exploitability_opt_es4.json
  recompose
fi

# ---- 6. Learned BR warm-started from the CMA attacker (verdict #1b).
if [ -f data/exploitability_opt.json ]; then
  run_job br2_es3 3600 python scripts/train_br.py \
    --opponent es3=data/policy_6max_es3.npz \
    --start optbot:data/exploitability_opt.json:es3 --soften 50 \
    --lr 1e-3 --updates 400 --save data/br_vs_es3_cma.npz
  commit_artifacts "Learned BR vs es3, warm-started from the CMA attacker" \
    data/br_vs_es3_cma.npz data/br_vs_es3_cma.npz.result.json
  recompose
fi

echo "r4b: ALL DONE $(date -u +%H:%M:%S)"
