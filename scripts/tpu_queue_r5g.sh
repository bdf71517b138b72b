#!/bin/bash
# Round-5 queue, stage g — es10: close the loop ON es9's own attackers.
#
# es9 (leashed pool-ES from the distilled init) broke the 1.2 bb
# plateau: adaptive CMA LB 0.349 (3:0), learned BR 0.348 — two
# independent families agreeing that ~0.35 bb is what the CURRENT
# attack machinery extracts. es9 was trained against es7-era
# attackers; its own battery then discovered NEW 3:0/1:0 CMA bots and
# a learned-BR net that each take ~0.35. es10 asks the next question:
# does feeding es9's own attackers back into leashed pool-ES push the
# honest LB below 0.35, or is 0.35 the fixed point of the
# probe->retrain loop at this capacity?
#
#   1. es10: leashed pool-ES (lambda 0.25, same fold anchors) FROM es9,
#      pool = es9 self-anchor + in-loop adaptive slots (3:0/1:0, both
#      geometries) + es9's fixed CMA attackers (optbot 3-0 and 1-0)
#      + the learned-BR net (data/br_vs_es9.npz) + random.
#   2. the honest battery: fold-gate diagnostic, in-loop trajectory,
#      fresh-seed adaptive CMA attack, static panel.
#   3. recompose the exploitability summary with es10.
#   4. final bench warm so the driver's round-end bench is hot.
#
#   setsid nohup bash scripts/tpu_queue_r5g.sh > logs/tpu_queue_r5g.log 2>&1 &

cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r5g.pid

END=$(date -u -d '2026-08-20 02:40:00' +%s)

# ---- wait for r5f to release the chip (ONE TPU job at a time) ----
if [ -f /tmp/tpu_queue_r5f.pid ]; then
  R5F=$(cat /tmp/tpu_queue_r5f.pid)
  while kill -0 "$R5F" 2>/dev/null; do
    echo "r5g: waiting for r5f (pid $R5F) $(date -u +%H:%M:%S)"
    sleep 120
  done
fi
echo "r5g: r5f done, starting $(date -u +%H:%M:%S)"
NOW=$(date -u +%s)

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
    echo "r5g: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r5g: committed ${have[*]}"
}

check_stop() {
  if [ -f /root/repo/.queue_stop ]; then
    echo "r5g: .queue_stop present, exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  check_stop
  [ "$deadline" -gt "$END" ] && deadline=$END
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5g: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  if [ $((deadline - now)) -lt 180 ]; then
    echo "r5g: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  check_stop
  now=$(date -u +%s)
  tmo=$((deadline - now))
  if [ "$tmo" -lt 180 ]; then
    echo "r5g: deadline passed during tunnel wait, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  echo "r5g: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5g: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120
  return $rc
}

run_cpu() {  # name timeout cmd...
  local name="$1" tmo="$2"; shift 2
  check_stop
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5g: $name already done, skipping"
    return 0
  fi
  echo "r5g: START(cpu) $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5g: DONE(cpu) $name rc=$rc $(date -u +%H:%M:%S)"
  return $rc
}

recompose_summary() {  # tag
  local tag="${1//[^A-Za-z0-9_-]/_}"
  local PANELS=(data/exploitability.json data/exploitability_hu.json)
  for f in data/exploitability_es4.json data/exploitability_es5.json \
           data/exploitability_es6.json data/exploitability_es7.json \
           data/exploitability_es8.json data/exploitability_es9.json \
           data/exploitability_es10.json data/exploitability_distill.json; do
    [ -f "$f" ] && PANELS+=("$f")
  done
  local OPTS=()
  for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
           data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
           data/exploitability_opt_es6.json data/exploitability_opt_es7.json \
           data/exploitability_opt_es8.json data/exploitability_opt_es9.json \
           data/exploitability_opt_es10.json \
           data/exploitability_opt_distill.json; do
    [ -f "$f" ] && OPTS+=("$f")
  done
  timeout 600 python scripts/exploitability_report.py \
    --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
    --save data/exploitability_summary.json \
    > "logs/q_exp_report_${tag}.log" 2>&1 \
    || { echo "r5g: recompose FAILED ($tag), keeping old summary"; return 1; }
  commit_artifacts "Recompose exploitability summary ($tag)" \
    data/exploitability_summary.json
}

# ---- 1. es10: leashed pool-ES vs es9's own attack battery ----
run_job es10 $((NOW + 5700)) python scripts/train_es_kernel.py \
  --opponents data/policy_6max_es9.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt_es9.json:es9:3-0,optbot:data/exploitability_opt_es9.json:es9:1-0,data/br_vs_es9.npz,random \
  --adapt-every 15 --adapt-gens 8 --adapt-popsize 12 \
  --start data/policy_6max_es9.npz \
  --fold-anchor data/fold_anchor.npz --fold-lambda 0.25 \
  --save data/policy_6max_es10.npz \
  --generations 150 --tables 16384 --steps 256 \
  --sigma 0.03 --lr 0.04 --resume
commit_artifacts "es10: leashed pool-ES vs es9's own attackers (CMA 3:0/1:0 + learned BR)" \
  data/policy_6max_es10.npz data/policy_6max_es10.npz.ckpt.npz \
  data/policy_6max_es10.npz.progress.json logs/q_es10.log

if [ -f data/policy_6max_es10.npz ]; then
  run_cpu foldgate_es10 2400 python scripts/fold_gate_check.py \
    --subjects es10=data/policy_6max_es10.npz --save data/fold_gate_es10.json
  commit_artifacts "es10 fold-gate + v2-usage diagnostic (leash under re-attack)" \
    data/fold_gate_es10.json
  run_cpu traj_es10 600 python scripts/extract_adapt_trajectory.py \
    logs/q_es10.log --save data/es10_adapt_trajectory.json
  commit_artifacts "es10 in-loop adaptive trajectory" \
    data/es10_adapt_trajectory.json
  run_job optbot_es10 $((NOW + 8700)) python scripts/opt_bot.py \
    --subjects es10=data/policy_6max_es10.npz --pairs 3:0,1:0,3:1 \
    --seed 83 --save data/exploitability_opt_es10.json
  commit_artifacts "Adaptive CMA exploitability vs es10 (fresh seed)" \
    data/exploitability_opt_es10.json
  run_job probe_es10 $((NOW + 9600)) python scripts/exploit_probe.py \
    --subjects es10=data/policy_6max_es10.npz \
    --geometry both --save data/exploitability_es10.json
  commit_artifacts "es10 static panel" data/exploitability_es10.json
  run_job league_es10_vs_es9 $((NOW + 10500)) \
    python scripts/league_eval.py --a data/policy_6max_es10.npz \
    --b data/policy_6max_es9.npz --skip-selfcheck
  if [ "$(cat logs/q_league_es10_vs_es9.rc)" = "0" ]; then
    tail -1 logs/q_league_es10_vs_es9.log \
      | python -c "import sys,json; json.loads(sys.stdin.read())" \
      && tail -1 logs/q_league_es10_vs_es9.log > data/league_es10_vs_es9.json
    commit_artifacts "League head-to-head: es10 vs es9" \
      data/league_es10_vs_es9.json
  fi
  recompose_summary "es10 re-attack loop"
fi

# ---- 4. final bench warm for the driver ----
run_job bench_g $((NOW + 12000)) python bench.py
if [ -f logs/q_bench_g.log ] && [ "$(cat logs/q_bench_g.rc)" = "0" ]; then
  tail -1 logs/q_bench_g.log | python -c "import sys,json; json.loads(sys.stdin.read())" \
    && tail -1 logs/q_bench_g.log > data/bench_r5_preview.json
  commit_artifacts "bench warm post-r5g" data/bench_r5_preview.json logs/q_bench_g.log
fi

echo "r5g: ALL DONE $(date -u +%H:%M:%S)"
