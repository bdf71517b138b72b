#!/bin/bash
# Round-5 queue, stage c — runs after r5b exits (waits on its pid).
# Uses the chip-time slack before the driver's round-end bench for the
# measurements that close the round's science:
#
#   1. optbot_distill: adaptive CMA vs the RAW Nash-distilled net —
#      the cleanest test of the verdict-#8 premise (did distillation
#      ALONE move adaptive exploitability off the ~1.2 plateau, before
#      any ES?). Its fold gate is open (36.1% fold=argmax,
#      data/fold_gate_distill.json); this prices that behavior.
#   2. learned BR vs es8, warm-started from es8's own CMA attacker —
#      the same honest-battery structure es7 got.
#   3. Full-range (stride 1) turn+river Nash-gap scoring ON THE TPU of
#      every round-4/5 artifact — comparable with the round-4
#      full-range baselines, which the 1-core host cannot reproduce.
#   4. Final summary recompose + final bench warm.
#
#   setsid nohup bash scripts/tpu_queue_r5c.sh > logs/tpu_queue_r5c.log 2>&1 &

cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r5c.pid

# ---- wait for r5b to finish (pid file + process liveness) ----
if [ -f /tmp/tpu_queue_r5b.pid ]; then
  while ps -p "$(cat /tmp/tpu_queue_r5b.pid)" >/dev/null 2>&1; do
    sleep 60
  done
fi
echo "r5c: r5b finished, starting $(date -u +%H:%M:%S)"

NOW=$(date -u +%s)
# hard stop: leave >=45 min before the estimated 16:45Z round end
END=$(date -u -d '2026-08-19 16:00:00' +%s)

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
    echo "r5c: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r5c: committed ${have[*]}"
}

check_stop() {
  if [ -f /root/repo/.queue_stop ]; then
    echo "r5c: .queue_stop present, exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  check_stop
  [ "$deadline" -gt "$END" ] && deadline=$END
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5c: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  if [ $((deadline - now)) -lt 180 ]; then
    echo "r5c: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  check_stop
  now=$(date -u +%s)
  tmo=$((deadline - now))
  if [ "$tmo" -lt 180 ]; then
    echo "r5c: deadline passed during tunnel wait, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  echo "r5c: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5c: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120
  return $rc
}

recompose_summary() {  # tag
  local tag="${1//[^A-Za-z0-9_-]/_}"
  local PANELS=(data/exploitability.json data/exploitability_hu.json)
  for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
           data/exploitability_es4.json data/exploitability_es5.json \
           data/exploitability_es6.json data/exploitability_es7.json \
           data/exploitability_es8.json data/exploitability_hu7.json \
           data/exploitability_distill.json; do
    [ -f "$f" ] && PANELS+=("$f")
  done
  local OPTS=()
  for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
           data/exploitability_opt_hu_mix.json \
           data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
           data/exploitability_opt_es6.json data/exploitability_opt_es7.json \
           data/exploitability_opt_es8.json data/exploitability_opt_distill.json \
           data/exploitability_opt_hu7.json; do
    [ -f "$f" ] && OPTS+=("$f")
  done
  timeout 600 python scripts/exploitability_report.py \
    --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
    --save data/exploitability_summary.json \
    > "logs/q_exp_report_${tag}.log" 2>&1 \
    || { echo "r5c: recompose FAILED ($tag), keeping old summary"; return 1; }
  commit_artifacts "Recompose exploitability summary ($tag)" \
    data/exploitability_summary.json
}

# ---- 1. adaptive CMA vs the raw distilled net ----
run_job optbot_distill $((NOW + 3600)) python scripts/opt_bot.py \
  --subjects distill=data/policy_6max_distill.npz --pairs 3:0,1:0 \
  --seed 73 --save data/exploitability_opt_distill.json
commit_artifacts "Adaptive CMA vs the raw Nash-distilled net (fold gate open: does it price below the 1.2 plateau?)" \
  data/exploitability_opt_distill.json
run_job probe_distill $((NOW + 4800)) python scripts/exploit_probe.py \
  --subjects distill=data/policy_6max_distill.npz \
  --geometry both --save data/exploitability_distill.json
commit_artifacts "Static panel vs the raw Nash-distilled net" \
  data/exploitability_distill.json

# ---- 2. learned BR vs es8 (same battery structure as es7) ----
if [ -f data/policy_6max_es8.npz ] && [ -f data/exploitability_opt_es8.json ]; then
  run_job br_es8 $((NOW + 8400)) python scripts/train_br.py \
    --opponent es8=data/policy_6max_es8.npz \
    --start optbot:data/exploitability_opt_es8.json:es8 --soften 50 \
    --updates 300 --tables 4096 --save data/br_vs_es8.npz
  commit_artifacts "Learned BR vs es8 (warm-started from its CMA attacker)" \
    data/br_vs_es8.npz data/br_vs_es8.npz.result.json
fi
recompose_summary "distill + es8 full battery"

# ---- 3. full-range Nash-gap scoring on the TPU ----
SUBJ="es2=data/policy_6max_es2.npz es3=data/policy_6max_es3.npz \
es4=data/policy_6max_es4.npz es5=data/policy_6max_es5.npz \
es6=data/policy_6max_es6.npz es7=data/policy_6max_es7.npz \
distill=data/policy_6max_distill.npz reinforce=data/policy_6max_200.npz \
untrained=INIT"
[ -f data/policy_6max_es8.npz ] && SUBJ="$SUBJ es8=data/policy_6max_es8.npz"

run_job turngap_tpu $((NOW + 13200)) env TURN_GAP_TPU=1 \
  python scripts/turn_gap.py --iterations 4000 --subjects $SUBJ \
  --save data/turn_gap.json
commit_artifacts "Full-range turn-gap scoring of every artifact (TPU; round-4-comparable)" \
  data/turn_gap.json
run_job rivergap_tpu $((NOW + 15600)) env RIVER_GAP_TPU=1 \
  python scripts/river_gap.py --iterations 6000 --subjects $SUBJ \
  --save data/river_gap.json
commit_artifacts "Full-range river-gap scoring of every artifact (TPU)" \
  data/river_gap.json

# ---- 4. final bench warm for the driver ----
run_job bench_c $((NOW + 16800)) python bench.py
commit_artifacts "bench warm post-r5c" logs/q_bench_c.log

echo "r5c: ALL DONE $(date -u +%H:%M:%S)"
