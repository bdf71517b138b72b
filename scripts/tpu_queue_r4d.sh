#!/bin/bash
# Round-4 queue, stage d (replaces r4c with a priority reorder + the
# gradient HU hardening): waits for r4b (es4 chain), then
#   1. bench preview        — warms the driver's round-end bench caches
#   2. hu_mix               — gradient hardening vs {fof_raise, self,
#                             random} (train_mix.py; the pool-ES recipe
#                             failed twice below its noise floor)
#   3. probe + CMA attack on the hardened artifact
#   4. full on-hardware validate (league routing fix never chip-checked
#                                 since the VM rebuild)
#   5. netgrid localization sweep (lost measurement, lowest priority)
# Each artifact is committed the moment it lands (VM rebuilds wipe
# everything uncommitted).
#
#   setsid nohup bash scripts/tpu_queue_r4d.sh > logs/tpu_queue_r4d.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4d.pid

stage_b_running() {
  ps ax -o args= | grep -E '(^|[ /])tpu_queue_r4b\.sh( |$)' > /dev/null
}
while ! grep -q "r4b: ALL DONE" logs/tpu_queue_r4b.log 2>/dev/null \
      && stage_b_running; do
  sleep 120
done
echo "r4d: r4b done $(date -u +%H:%M:%S)"

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
    echo "r4d: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r4d: committed ${have[*]}"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4d: $name already done, skipping"
    return 0
  fi
  local cutoff; cutoff=$(cat /tmp/q_cutoff 2>/dev/null || echo 1415)
  if [ "$(date -u +%H%M)" -ge "$cutoff" ]; then
    echo "r4d: past cutoff $cutoff, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4d: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4d: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # chip settle (kill mid-run can wedge ~2 min)
  return $rc
}

# ---- 1. Bench preview: BENCH_r04 fields + warm compile caches so the
#         driver's round-end bench through the tunnel is not cold.
run_job bench_preview 2700 python bench.py

# ---- 2. Gradient HU hardening (train_mix.py): the fof_raise hole.
run_job hu_mix 5400 python scripts/train_mix.py \
  --seats 2 --start data/policy_hu_300.npz \
  --opponents 'bot:fof_raise%0,self%-0.03,random%1.8' \
  --updates 300 --tables 8192 --lr 1e-3 \
  --save data/policy_hu_mix.npz
commit_artifacts "HU gradient hardening artifact (mixed pool, min-slack)" \
  data/policy_hu_mix.npz data/policy_hu_mix.npz.result.json

if [ -f data/policy_hu_mix.npz ]; then
  run_job probe_hu_mix 3600 python scripts/exploit_probe.py \
    --seats 2 --subjects hu_mix=data/policy_hu_mix.npz \
    --geometry both --save data/exploitability_hu_mix.json
  commit_artifacts "HU gradient-hardened artifact panel probe" \
    data/exploitability_hu_mix.json
  run_job optbot_hu_mix 4800 python scripts/opt_bot.py --seats 2 \
    --subjects hu_mix=data/policy_hu_mix.npz \
    --pairs 3:0,1:0 --save data/exploitability_opt_hu_mix.json
  commit_artifacts "Adaptive CMA exploitability vs the HU hardened artifact" \
    data/exploitability_opt_hu_mix.json
  # fold the new subject into the summary
  PANELS=(data/exploitability.json data/exploitability_hu.json
          data/exploitability_hu_es.json data/exploitability_hu_mix.json)
  [ -f data/exploitability_es4.json ] && PANELS+=(data/exploitability_es4.json)
  OPTS=(data/exploitability_opt.json data/exploitability_opt_hu.json
        data/exploitability_opt_hu_mix.json)
  [ -f data/exploitability_opt_es4.json ] && OPTS+=(data/exploitability_opt_es4.json)
  timeout 600 python scripts/exploitability_report.py \
    --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
    --save data/exploitability_summary.json \
    > logs/q_exp_report_r4d.log 2>&1
  commit_artifacts "Recompose exploitability summary (HU hardened subject)" \
    data/exploitability_summary.json
fi

# ---- 3. Full on-hardware validate.
run_job validate_full 3600 python scripts/validate_tpu.py

# ---- 4. Netgrid localization sweep (lost measurement artifact).
run_job netgrid 5400 python scripts/exp_net_grid.py

echo "r4d: ALL DONE $(date -u +%H:%M:%S)"
