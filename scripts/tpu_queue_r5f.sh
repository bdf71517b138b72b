#!/bin/bash
# Round-5 queue, stage f — complete the es9 attack battery and the
# round close-out after r5e's 22:45 cutoff.
#
# es9 (leashed pool-ES from the distilled init) broke the 1.2 bb
# plateau: adaptive CMA LB 0.349 (3:0), 0.125 (1:0), 3:1 LOSES 1.19.
# This stage makes that number honest across all three attacker
# families and finishes whatever r5e's wall-clock cut:
#
#   1. solver_br_es9: eval the exact-BR distilled net (built on CPU by
#      scripts/distill_nash.py --mode br while r5e held the chip) vs
#      es9 on the league kernel -> data/solver_br_vs_es9.result.json.
#   2. br_es9: learned REINFORCE BR warm-started from es9's own CMA
#      attacker (the round-4 recipe) -> data/br_vs_es9.npz.result.json.
#   3. league_*: es9 vs es8 / es7 / distill head-to-heads — did the
#      leash cost absolute strength vs the unleashed sibling?
#   4. turngap/rivergap re-run IF r5e cut them (same rc-file names, so
#      completed stages self-skip).
#   5. recompose the exploitability summary with the new families.
#   6. final bench warm so the driver's round-end bench hits a hot
#      compile cache.
#
#   setsid nohup bash scripts/tpu_queue_r5f.sh > logs/tpu_queue_r5f.log 2>&1 &

cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r5f.pid

NOW=$(date -u +%s)
END=$(date -u -d '2026-08-20 00:40:00' +%s)

# ---- wait for r5e to release the chip (ONE TPU job at a time) ----
if [ -f /tmp/tpu_queue_r5e.pid ]; then
  R5E=$(cat /tmp/tpu_queue_r5e.pid)
  while kill -0 "$R5E" 2>/dev/null; do
    echo "r5f: waiting for r5e (pid $R5E) $(date -u +%H:%M:%S)"
    sleep 120
  done
fi
echo "r5f: r5e done, starting $(date -u +%H:%M:%S)"

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
    echo "r5f: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r5f: committed ${have[*]}"
}

check_stop() {
  if [ -f /root/repo/.queue_stop ]; then
    echo "r5f: .queue_stop present, exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  check_stop
  [ "$deadline" -gt "$END" ] && deadline=$END
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5f: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  if [ $((deadline - now)) -lt 180 ]; then
    echo "r5f: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  check_stop
  now=$(date -u +%s)
  tmo=$((deadline - now))
  if [ "$tmo" -lt 180 ]; then
    echo "r5f: deadline passed during tunnel wait, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  echo "r5f: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5f: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120
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
    || { echo "r5f: recompose FAILED ($tag), keeping old summary"; return 1; }
  commit_artifacts "Recompose exploitability summary ($tag)" \
    data/exploitability_summary.json
}

# ---- 1. solver-BR family vs es9 ----
if [ -f data/br_solver_vs_es9.npz ]; then
  run_job solver_br_es9 $((NOW + 9000)) python scripts/eval_attacker.py \
    --attacker data/br_solver_vs_es9.npz \
    --subject es9=data/policy_6max_es9.npz \
    --family solver_br --save data/solver_br_vs_es9.result.json
  commit_artifacts "Solver-BR attacker family vs es9 (full-game eval)" \
    data/solver_br_vs_es9.result.json data/br_solver_vs_es9.npz \
    data/br_solver_vs_es9.npz.result.json logs/distill_br_es9.log
else
  echo "r5f: br_solver_vs_es9.npz absent, skipping solver_br_es9"
fi

# ---- 2. learned BR vs es9 (warm-started from its CMA attacker) ----
run_job br_es9 $((NOW + 10800)) python scripts/train_br.py \
  --opponent es9=data/policy_6max_es9.npz \
  --start optbot:data/exploitability_opt_es9.json:es9 --soften 50 \
  --updates 300 --tables 4096 --save data/br_vs_es9.npz
commit_artifacts "Learned BR vs es9 (warm-started from its CMA attacker)" \
  data/br_vs_es9.npz data/br_vs_es9.npz.result.json

recompose_summary "es9 three-family battery"

# ---- 3. head-to-heads: did the leash cost absolute strength? ----
league() {  # name a b
  local name="$1" a="$2" b="$3"
  run_job "league_${name}" $((NOW + 12600)) \
    python scripts/league_eval.py --a "$a" --b "$b" --skip-selfcheck
  if [ "$(cat logs/q_league_${name}.rc)" = "0" ]; then
    tail -1 "logs/q_league_${name}.log" \
      | python -c "import sys,json; json.loads(sys.stdin.read())" \
      && tail -1 "logs/q_league_${name}.log" > "data/league_${name}.json"
    commit_artifacts "League head-to-head: ${name}" "data/league_${name}.json"
  fi
}
league es9_vs_es8 data/policy_6max_es9.npz data/policy_6max_es8.npz
league es9_vs_es7 data/policy_6max_es9.npz data/policy_6max_es7.npz
league es9_vs_distill data/policy_6max_es9.npz data/policy_6max_distill.npz

# ---- 4. gap scoring if r5e's cutoff killed it (self-skips on rc=0) ----
SUBJ="es2=data/policy_6max_es2.npz es3=data/policy_6max_es3.npz \
es4=data/policy_6max_es4.npz es5=data/policy_6max_es5.npz \
es6=data/policy_6max_es6.npz es7=data/policy_6max_es7.npz \
distill=data/policy_6max_distill.npz es8=data/policy_6max_es8.npz \
reinforce=data/policy_6max_200.npz untrained=INIT \
es9=data/policy_6max_es9.npz"

run_job turngap_tpu $((NOW + 15000)) env TURN_GAP_TPU=1 \
  python scripts/turn_gap.py --iterations 4000 --subjects $SUBJ \
  --save data/turn_gap.json
commit_artifacts "Full-range turn-gap scoring of every artifact (TPU; round-4-comparable)" \
  data/turn_gap.json
run_job rivergap_tpu $((NOW + 16800)) env RIVER_GAP_TPU=1 \
  python scripts/river_gap.py --iterations 6000 --subjects $SUBJ \
  --save data/river_gap.json
commit_artifacts "Full-range river-gap scoring of every artifact (TPU)" \
  data/river_gap.json

# ---- 5. final bench warm for the driver ----
run_job bench_f $((NOW + 18000)) python bench.py
if [ -f logs/q_bench_f.log ] && [ "$(cat logs/q_bench_f.rc)" = "0" ]; then
  tail -1 logs/q_bench_f.log | python -c "import sys,json; json.loads(sys.stdin.read())" \
    && tail -1 logs/q_bench_f.log > data/bench_r5_preview.json
  commit_artifacts "bench warm post-r5f" data/bench_r5_preview.json logs/q_bench_f.log
fi

echo "r5f: ALL DONE $(date -u +%H:%M:%S)"
