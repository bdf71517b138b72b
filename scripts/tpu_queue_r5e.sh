#!/bin/bash
# Round-5 queue, stage e — RECOVERY of the never-run r5d plan.
#
# The VM was rebuilt at 17:59 UTC (wiping /root/.jax_cache and /tmp)
# and the r5d wall-clock window (END 16:05) had already passed, so the
# r5d queue never executed: no es9, no full-range TPU gap scoring, no
# final bench warm. This stage re-runs that plan with fresh deadlines
# and one ordering change: bench warm-up FIRST (r4k pattern) so the
# driver's round-end bench can't be hit with a cold compile cache if a
# later stage wedges the chip.
#
#   setsid nohup bash scripts/tpu_queue_r5e.sh > logs/tpu_queue_r5e.log 2>&1 &

cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r5e.pid

NOW=$(date -u +%s)
END=$(date -u -d '2026-08-19 22:45:00' +%s)

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
    echo "r5e: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 180
  done
}

commit_artifacts() {  # msg paths...
  local msg="$1"; shift
  local have=()
  for p in "$@"; do [ -f "$p" ] && have+=("$p"); done
  [ ${#have[@]} -eq 0 ] && return 0
  git add -f "${have[@]}"
  git diff --cached --quiet || git commit -q -m "$msg"
  echo "r5e: committed ${have[*]}"
}

check_stop() {
  if [ -f /root/repo/.queue_stop ]; then
    echo "r5e: .queue_stop present, exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  check_stop
  [ "$deadline" -gt "$END" ] && deadline=$END
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5e: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  if [ $((deadline - now)) -lt 180 ]; then
    echo "r5e: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  check_stop
  now=$(date -u +%s)
  tmo=$((deadline - now))
  if [ "$tmo" -lt 180 ]; then
    echo "r5e: deadline passed during tunnel wait, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  echo "r5e: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5e: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120
  return $rc
}

run_cpu() {  # name timeout cmd...
  local name="$1" tmo="$2"; shift 2
  check_stop
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5e: $name already done, skipping"
    return 0
  fi
  echo "r5e: START(cpu) $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5e: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  return $rc
}

recompose_summary() {  # tag
  local tag="${1//[^A-Za-z0-9_-]/_}"
  local PANELS=(data/exploitability.json data/exploitability_hu.json)
  for f in data/exploitability_es4.json data/exploitability_es5.json \
           data/exploitability_es6.json data/exploitability_es7.json \
           data/exploitability_es8.json data/exploitability_es9.json \
           data/exploitability_distill.json; do
    [ -f "$f" ] && PANELS+=("$f")
  done
  local OPTS=()
  for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
           data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
           data/exploitability_opt_es6.json data/exploitability_opt_es7.json \
           data/exploitability_opt_es8.json data/exploitability_opt_es9.json \
           data/exploitability_opt_distill.json; do
    [ -f "$f" ] && OPTS+=("$f")
  done
  timeout 600 python scripts/exploitability_report.py \
    --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
    --save data/exploitability_summary.json \
    > "logs/q_exp_report_${tag}.log" 2>&1 \
    || { echo "r5e: recompose FAILED ($tag), keeping old summary"; return 1; }
  commit_artifacts "Recompose exploitability summary ($tag)" \
    data/exploitability_summary.json
}

# ---- 0. bench warm-up first: the rebuild wiped /root/.jax_cache ----
run_job bench_warm $((NOW + 2400)) python bench.py
if [ -f logs/q_bench_warm.log ] && [ "$(cat logs/q_bench_warm.rc)" = "0" ]; then
  tail -1 logs/q_bench_warm.log | python -c "import sys,json; json.loads(sys.stdin.read())" \
    && tail -1 logs/q_bench_warm.log > data/bench_r5_preview.json
  commit_artifacts "bench warm post-rebuild (r5e stage 0)" \
    data/bench_r5_preview.json logs/q_bench_warm.log
fi

# ---- 1. es9: leashed pool-ES from the distilled init ----
run_job es9 $((NOW + 7800)) python scripts/train_es_kernel.py \
  --opponents data/policy_6max_es7.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt_es7.json:es7,random \
  --adapt-every 15 --adapt-gens 8 --adapt-popsize 12 \
  --start data/policy_6max_distill.npz \
  --fold-anchor data/fold_anchor.npz --fold-lambda 0.25 \
  --save data/policy_6max_es9.npz \
  --generations 150 --tables 16384 --steps 256 \
  --sigma 0.03 --lr 0.04 --resume
commit_artifacts "es9: leashed pool-ES (fold-preservation lambda 0.25) from the distilled init" \
  data/policy_6max_es9.npz data/policy_6max_es9.npz.ckpt.npz \
  data/policy_6max_es9.npz.progress.json logs/q_es9.log

if [ -f data/policy_6max_es9.npz ]; then
  run_cpu foldgate_es9 2400 python scripts/fold_gate_check.py \
    --subjects es9=data/policy_6max_es9.npz --save data/fold_gate_es9.json
  commit_artifacts "es9 fold-gate + v2-usage diagnostic (did the leash hold?)" \
    data/fold_gate_es9.json
  run_cpu traj_es9 600 python scripts/extract_adapt_trajectory.py \
    logs/q_es9.log --save data/es9_adapt_trajectory.json
  commit_artifacts "es9 in-loop adaptive trajectory" \
    data/es9_adapt_trajectory.json
  run_job optbot_es9 $((NOW + 10500)) python scripts/opt_bot.py \
    --subjects es9=data/policy_6max_es9.npz --pairs 3:0,1:0,3:1 \
    --seed 79 --save data/exploitability_opt_es9.json
  commit_artifacts "Adaptive CMA exploitability vs es9 (the leashed run)" \
    data/exploitability_opt_es9.json
  run_job probe_es9 $((NOW + 11400)) python scripts/exploit_probe.py \
    --subjects es9=data/policy_6max_es9.npz \
    --geometry both --save data/exploitability_es9.json
  commit_artifacts "es9 static panel" data/exploitability_es9.json
  recompose_summary "es9 leashed battery"
fi

# ---- 2. full-range Nash-gap scoring on the TPU ----
SUBJ="es2=data/policy_6max_es2.npz es3=data/policy_6max_es3.npz \
es4=data/policy_6max_es4.npz es5=data/policy_6max_es5.npz \
es6=data/policy_6max_es6.npz es7=data/policy_6max_es7.npz \
distill=data/policy_6max_distill.npz es8=data/policy_6max_es8.npz \
reinforce=data/policy_6max_200.npz untrained=INIT"
[ -f data/policy_6max_es9.npz ] && SUBJ="$SUBJ es9=data/policy_6max_es9.npz"

run_job turngap_tpu $((NOW + 13800)) env TURN_GAP_TPU=1 \
  python scripts/turn_gap.py --iterations 4000 --subjects $SUBJ \
  --save data/turn_gap.json
commit_artifacts "Full-range turn-gap scoring of every artifact (TPU; round-4-comparable)" \
  data/turn_gap.json
run_job rivergap_tpu $((NOW + 16200)) env RIVER_GAP_TPU=1 \
  python scripts/river_gap.py --iterations 6000 --subjects $SUBJ \
  --save data/river_gap.json
commit_artifacts "Full-range river-gap scoring of every artifact (TPU)" \
  data/river_gap.json

# ---- 3. final bench warm for the driver ----
run_job bench_e $((NOW + 17400)) python bench.py
if [ -f logs/q_bench_e.log ] && [ "$(cat logs/q_bench_e.rc)" = "0" ]; then
  tail -1 logs/q_bench_e.log | python -c "import sys,json; json.loads(sys.stdin.read())" \
    && tail -1 logs/q_bench_e.log > data/bench_r5_preview.json
  commit_artifacts "bench warm post-r5e" data/bench_r5_preview.json logs/q_bench_e.log
fi

echo "r5e: ALL DONE $(date -u +%H:%M:%S)"
