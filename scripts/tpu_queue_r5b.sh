#!/bin/bash
# Round-5 queue, stage b — after r5a's honest attack battery confirmed
# the ~1.2 bb adaptive plateau persists through es7 (fold gate still
# shut, v2 features unread), this stage runs the remaining program:
#
#   1. hu7 rerun (VERDICT #4) — r5a's attempt died on the undefined
#      --resume flag in train_mix (fixed in 5447cfe).
#   2. Solver-BR attacker (VERDICT #7): full-game eval of the net
#      distilled from the exact subgame best response vs es7
#      (scripts/distill_nash.py --mode br runs on CPU beforehand and
#      this stage gates on its artifact).
#   3. es8 (VERDICT #8): pool-ES from the NASH-DISTILLED init — the
#      first run whose two-street play starts at the solver's
#      equilibrium instead of hoping relative fitness finds it.
#      Time-boxed and resumable; artifacts committed as produced.
#   4. es8 attack battery (fold gate, fresh CMA, panel) + summary.
#
# Wall-clock budget: launched ~09:30Z, driver round end ~16:45Z; the
# last deadline leaves >1h of slack for the driver's own bench.
#
#   setsid nohup bash scripts/tpu_queue_r5b.sh > logs/tpu_queue_r5b.log 2>&1 &

cd /root/repo || exit 1
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r5b.pid

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
    echo "r5b: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r5b: committed ${have[*]}"
}

check_stop() {
  if [ -f /root/repo/.queue_stop ]; then
    echo "r5b: .queue_stop present, exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  check_stop
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5b: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  if [ $((deadline - now)) -lt 180 ]; then
    echo "r5b: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  check_stop
  now=$(date -u +%s)
  tmo=$((deadline - now))
  if [ "$tmo" -lt 180 ]; then
    echo "r5b: deadline passed during tunnel wait, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  echo "r5b: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5b: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120   # chip settle
  return $rc
}

run_cpu() {  # name timeout cmd...
  local name="$1" tmo="$2"; shift 2
  check_stop
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5b: $name already done, skipping"
    return 0
  fi
  echo "r5b: START(cpu) $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5b: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  return $rc
}

recompose_summary() {  # tag
  local tag="${1//[^A-Za-z0-9_-]/_}"
  local PANELS=(data/exploitability.json data/exploitability_hu.json)
  for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
           data/exploitability_es4.json data/exploitability_es5.json \
           data/exploitability_es6.json data/exploitability_es7.json \
           data/exploitability_es8.json data/exploitability_hu7.json; do
    [ -f "$f" ] && PANELS+=("$f")
  done
  local OPTS=()
  for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
           data/exploitability_opt_hu_mix.json \
           data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
           data/exploitability_opt_es6.json data/exploitability_opt_es7.json \
           data/exploitability_opt_es8.json \
           data/exploitability_opt_hu7.json; do
    [ -f "$f" ] && OPTS+=("$f")
  done
  timeout 600 python scripts/exploitability_report.py \
    --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
    --save data/exploitability_summary.json \
    > "logs/q_exp_report_${tag}.log" 2>&1 \
    || { echo "r5b: recompose FAILED ($tag), keeping old summary"; return 1; }
  commit_artifacts "Recompose exploitability summary ($tag)" \
    data/exploitability_summary.json
}

# ---- 1. hu7 rerun (VERDICT #4) ----
run_job hu7b $((NOW + 5400)) python scripts/train_mix.py \
  --seats 2 --start data/policy_hu_300.npz --soften 8 \
  --opponents 'optbot:data/exploitability_opt_hu.json:hu%0,self%-0.03,random%1.5' \
  --updates 300 --tables 8192 --lr 1e-3 --max-steps 24 --resume \
  --save data/policy_hu7.npz
commit_artifacts "hu7: v2-feature gradient un-freeze of the HU line" \
  data/policy_hu7.npz data/policy_hu7.npz.progress.json logs/q_hu7b.log

if [ -f data/policy_hu7.npz ]; then
  run_cpu foldgate_hu7 1800 python scripts/fold_gate_check.py \
    --subjects hu7=data/policy_hu7.npz --save data/fold_gate_hu7.json
  commit_artifacts "hu7 fold-gate + v2-usage diagnostic" data/fold_gate_hu7.json
  run_job probe_hu7 $((NOW + 7200)) python scripts/exploit_probe.py \
    --subjects hu7=data/policy_hu7.npz --seats 2 \
    --geometry both --save data/exploitability_hu7.json
  commit_artifacts "hu7 panel probe" data/exploitability_hu7.json
  run_job optbot_hu7 $((NOW + 9600)) python scripts/opt_bot.py \
    --subjects hu7=data/policy_hu7.npz --pairs 3:0,1:0 --seats 2 \
    --seed 67 --save data/exploitability_opt_hu7.json
  commit_artifacts "Adaptive CMA exploitability vs hu7" \
    data/exploitability_opt_hu7.json
  recompose_summary "hu7 attack battery"
fi

# ---- 2. Solver-BR attacker full-game eval (VERDICT #7) ----
# Gated on the CPU br-distill having produced the attacker net.
if [ -f data/br_solver_vs_es7.npz ]; then
  run_job solver_br_es7 $((NOW + 11400)) python scripts/eval_attacker.py \
    --attacker data/br_solver_vs_es7.npz \
    --subject es7=data/policy_6max_es7.npz \
    --family solver_br --save data/solver_br_vs_es7.result.json
  commit_artifacts "Solver-BR attacker family vs es7 (full-game eval)" \
    data/solver_br_vs_es7.result.json
  recompose_summary "solver-BR family"
else
  echo "r5b: br_solver_vs_es7.npz absent, skipping solver_br_es7"
fi

# ---- 3. es8: pool-ES from the Nash-distilled init (VERDICT #8) ----
if [ -f data/policy_6max_distill.npz ]; then
  run_job es8 $((NOW + 16200)) python scripts/train_es_kernel.py \
    --opponents data/policy_6max_es7.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt_es7.json:es7,random \
    --adapt-every 15 --adapt-gens 8 --adapt-popsize 12 \
    --start data/policy_6max_distill.npz \
    --save data/policy_6max_es8.npz \
    --generations 150 --tables 16384 --steps 256 \
    --sigma 0.03 --lr 0.04 --resume
  commit_artifacts "es8: pool-ES from the Nash-distilled init" \
    data/policy_6max_es8.npz data/policy_6max_es8.npz.ckpt.npz \
    data/policy_6max_es8.npz.progress.json logs/q_es8.log

  # ---- 4. es8 attack battery ----
  if [ -f data/policy_6max_es8.npz ]; then
    run_cpu foldgate_es8 1800 python scripts/fold_gate_check.py \
      --subjects es8=data/policy_6max_es8.npz --save data/fold_gate_es8.json
    commit_artifacts "es8 fold-gate + v2-usage diagnostic" \
      data/fold_gate_es8.json
    run_job optbot_es8 $((NOW + 19800)) python scripts/opt_bot.py \
      --subjects es8=data/policy_6max_es8.npz --pairs 3:0,1:0,3:1 \
      --seed 71 --save data/exploitability_opt_es8.json
    commit_artifacts "Adaptive CMA exploitability vs es8" \
      data/exploitability_opt_es8.json
    run_job probe_es8 $((NOW + 21000)) python scripts/exploit_probe.py \
      --subjects es8=data/policy_6max_es8.npz \
      --geometry both --save data/exploitability_es8.json
    commit_artifacts "es8 static panel" data/exploitability_es8.json
    recompose_summary "es8 battery"
  fi
else
  echo "r5b: policy_6max_distill.npz absent, skipping es8"
fi

# ---- 5. bench warm for the driver's round-end run ----
run_job bench_b $((NOW + 22200)) python bench.py
commit_artifacts "bench warm post-r5b" logs/q_bench_b.log

echo "r5b: ALL DONE $(date -u +%H:%M:%S)"
