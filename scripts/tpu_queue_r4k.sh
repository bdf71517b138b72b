#!/bin/bash
# Round-4 queue, stage k: recovery after the VM rebuild wiped stage-i/j
# (logs/, /root/.jax_cache, /tmp pids, and the in-flight es7/mix7 runs
# all gone; only committed artifacts survived). Rescoped for the ~50 min
# left in the round:
#   1. bench.py FIRST — the cache wipe means the driver's round-end
#      bench would otherwise pay every cold Mosaic compile through the
#      tunnel (minutes each, occasional hangs). This also smoke-tests
#      the compiled kernels after the feature-v2 layout change
#      (last_raiser lane, 24 features).
#   2. es7 — the v2-feature pool-ES experiment, time-boxed instead of
#      250 gens: the trainer checkpoints every center eval
#      (<save>.ckpt.npz / .progress.json / best-by-holdout to <save>),
#      so whatever generations fit are a committed, resumable artifact.
#   3. fold_gate_check (CPU) — the v2-usage diagnostic: did the trained
#      net learn to READ the aggression features (argmax flips when
#      indices 20-23 are zeroed)?
#   4. Short panel probe + summary recompose; validate_tpu only if time
#      remains (bench already exercises the compiled kernels).
#
#   setsid nohup bash scripts/tpu_queue_r4k.sh > logs/tpu_queue_r4k.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r4k.pid

NOW=$(date -u +%s)
TRAIN_STOP=$((NOW + 2100))   # no training past ~35 min in
PROBE_STOP=$((NOW + 2700))   # no new TPU job starts past ~45 min in

probe() {
  timeout 300 python - <<'EOF' >/dev/null 2>&1
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
    echo "r4k: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 180
  done
}

commit_artifacts() {  # msg paths...
  local msg="$1"; shift
  local have=()
  for p in "$@"; do [ -f "$p" ] && have+=("$p"); done
  [ ${#have[@]} -eq 0 ] && return 0
  git add "${have[@]}" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$msg"
  echo "r4k: committed ${have[*]}"
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r4k: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  tmo=$((deadline - now))
  if [ "$tmo" -lt 180 ]; then
    echo "r4k: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  echo "r4k: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r4k: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120   # chip settle
  return $rc
}

# ---- 1. bench: warm the driver's compile cache (wiped by the rebuild).
run_job bench_k $((NOW + 1500)) python bench.py
if [ -f logs/q_bench_k.log ]; then
  tail -1 logs/q_bench_k.log > data/bench_r4_preview.json 2>/dev/null || true
  commit_artifacts "bench preview post-rebuild (warms the driver's cold cache)" \
    data/bench_r4_preview.json
fi

# ---- 2. es7: v2 features, full-parameter pool-ES, time-boxed.
ES7_START=data/policy_6max_es6.npz
[ -f "$ES7_START" ] || ES7_START=data/policy_6max_es5.npz
run_job es7 "$TRAIN_STOP" python scripts/train_es_kernel.py \
  --opponents "data/policy_6max_es3.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt.json:es3,random" \
  --adapt-every 15 --adapt-gens 8 --adapt-popsize 12 \
  --start "$ES7_START" --soften 2 --save data/policy_6max_es7.npz \
  --generations 250 --tables 16384 --steps 256 \
  --sigma 0.05 --lr 0.05 --resume
commit_artifacts "es7: v2-feature pool-ES (time-boxed; resumable checkpoint)" \
  data/policy_6max_es7.npz data/policy_6max_es7.npz.ckpt.npz \
  data/policy_6max_es7.npz.progress.json logs/q_es7.log

# ---- 3. v2-usage + fold-gate diagnostic (CPU; no tunnel contention).
ES7_ART=data/policy_6max_es7.npz
[ -f "$ES7_ART" ] || ES7_ART=data/policy_6max_es7.npz.ckpt.npz
if [ -f "$ES7_ART" ]; then
  timeout 900 python scripts/fold_gate_check.py \
    --subjects "es7=$ES7_ART" --save data/fold_gate_es7.json \
    > logs/q_foldgate7.log 2>&1
  commit_artifacts "fold-gate + v2-usage diagnostic for es7" \
    data/fold_gate_es7.json
fi

# ---- 4. short panel probe on whatever es7 exists.
if [ -f "$ES7_ART" ]; then
  run_job probe_es7 "$PROBE_STOP" python scripts/exploit_probe.py \
    --subjects "es7=$ES7_ART" \
    --geometry both --tables 32768 --steps 512 \
    --save data/exploitability_es7.json
  commit_artifacts "es7 panel probe (both geometries)" \
    data/exploitability_es7.json
fi

# ---- 5. summary recompose (CPU-side JSON merge).
PANELS=(data/exploitability.json data/exploitability_hu.json)
for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
         data/exploitability_es4.json data/exploitability_es5.json \
         data/exploitability_es6.json data/exploitability_es7.json; do
  [ -f "$f" ] && PANELS+=("$f")
done
OPTS=()
for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
         data/exploitability_opt_hu_mix.json \
         data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
         data/exploitability_opt_es6.json data/exploitability_opt_es7.json; do
  [ -f "$f" ] && OPTS+=("$f")
done
timeout 600 python scripts/exploitability_report.py \
  --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
  --save data/exploitability_summary.json \
  > logs/q_exp_report_r4k.log 2>&1
commit_artifacts "Recompose exploitability summary (es7 subject)" \
  data/exploitability_summary.json

# ---- 6. validate_tpu only if real time remains.
run_job validate_k "$PROBE_STOP" python scripts/validate_tpu.py
commit_artifacts "validate_tpu log (post-rebuild)" logs/q_validate_k.log

echo "r4k: ALL DONE $(date -u +%H:%M:%S)"
