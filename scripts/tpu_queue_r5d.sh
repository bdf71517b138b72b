#!/bin/bash
# Round-5 queue, stage d — the leashed run (es9) plus the gap scoring
# displaced from r5c.
#
# es8 closed the loop on VERDICT #8's naive form: distill opens the
# fold gate (36.1% fold=argmax), unleashed pool-ES erases it again and
# lands back on the plateau (CMA 1.131 on 3:0). es9 re-runs the same
# recipe WITH the fold-preservation leash (train_es_kernel
# --fold-anchor, lambda 0.25: defecting to never-fold costs ~2.0 bb of
# shaped fitness, more than the 1.13 it buys). Then the honest battery,
# the full-range TPU gap scoring of every artifact, and the final
# bench warm.
#
# Launched after r5c is stopped (.queue_stop) — the launcher must
# remove .queue_stop before starting this script.
#
#   setsid nohup bash scripts/tpu_queue_r5d.sh > logs/tpu_queue_r5d.log 2>&1 &

cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r5d.pid

# wait for r5c to exit
if [ -f /tmp/tpu_queue_r5c.pid ]; then
  while ps -p "$(cat /tmp/tpu_queue_r5c.pid)" >/dev/null 2>&1; do
    sleep 30
  done
fi
echo "r5d: r5c finished, starting $(date -u +%H:%M:%S)"

NOW=$(date -u +%s)
END=$(date -u -d '2026-08-19 16:05:00' +%s)

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
    echo "r5d: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r5d: committed ${have[*]}"
}

check_stop() {
  if [ -f /root/repo/.queue_stop ]; then
    echo "r5d: .queue_stop present, exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  check_stop
  [ "$deadline" -gt "$END" ] && deadline=$END
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5d: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  if [ $((deadline - now)) -lt 180 ]; then
    echo "r5d: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  check_stop
  now=$(date -u +%s)
  tmo=$((deadline - now))
  if [ "$tmo" -lt 180 ]; then
    echo "r5d: deadline passed during tunnel wait, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  echo "r5d: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5d: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120
  return $rc
}

run_cpu() {  # name timeout cmd...
  local name="$1" tmo="$2"; shift 2
  check_stop
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5d: $name already done, skipping"
    return 0
  fi
  echo "r5d: START(cpu) $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5d: DONE $name rc=$rc $(date -u +%H:%M:%S)"
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
    || { echo "r5d: recompose FAILED ($tag), keeping old summary"; return 1; }
  commit_artifacts "Recompose exploitability summary ($tag)" \
    data/exploitability_summary.json
}

# ---- 1. es9: leashed pool-ES from the distilled init ----
run_job es9 $((NOW + 5400)) python scripts/train_es_kernel.py \
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
  run_cpu foldgate_es9 1800 python scripts/fold_gate_check.py \
    --subjects es9=data/policy_6max_es9.npz --save data/fold_gate_es9.json
  commit_artifacts "es9 fold-gate + v2-usage diagnostic (did the leash hold?)" \
    data/fold_gate_es9.json
  run_cpu traj_es9 600 python scripts/extract_adapt_trajectory.py \
    logs/q_es9.log --save data/es9_adapt_trajectory.json
  commit_artifacts "es9 in-loop adaptive trajectory" \
    data/es9_adapt_trajectory.json
  run_job optbot_es9 $((NOW + 9000)) python scripts/opt_bot.py \
    --subjects es9=data/policy_6max_es9.npz --pairs 3:0,1:0,3:1 \
    --seed 79 --save data/exploitability_opt_es9.json
  commit_artifacts "Adaptive CMA exploitability vs es9 (the leashed run)" \
    data/exploitability_opt_es9.json
  run_job probe_es9 $((NOW + 10200)) python scripts/exploit_probe.py \
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

run_job turngap_tpu $((NOW + 15000)) env TURN_GAP_TPU=1 \
  python scripts/turn_gap.py --iterations 4000 --subjects $SUBJ \
  --save data/turn_gap.json
commit_artifacts "Full-range turn-gap scoring of every artifact (TPU; round-4-comparable)" \
  data/turn_gap.json
run_job rivergap_tpu $((NOW + 17400)) env RIVER_GAP_TPU=1 \
  python scripts/river_gap.py --iterations 6000 --subjects $SUBJ \
  --save data/river_gap.json
commit_artifacts "Full-range river-gap scoring of every artifact (TPU)" \
  data/river_gap.json

# ---- 3. final bench warm for the driver ----
run_job bench_d $((NOW + 18600)) python bench.py
commit_artifacts "bench warm post-r5d" logs/q_bench_d.log

echo "r5d: ALL DONE $(date -u +%H:%M:%S)"
