#!/bin/bash
# Round-5 queue, stage a — the verdict's training/measurement program.
# Order encodes priority (a wall-clock cutoff loses the least important
# tail): hygiene first (validate_tpu post-v2 on hardware, bench cache
# warm — VERDICT #3), then the round's central question (finish es7 to
# 250 gens and attack it honestly — VERDICT #1: fold_gate_check, fresh
# CMA in the 25-dim v2 rule space, warm-started learned BR, panel),
# then the provenance regen (REAL es5/es6 adaptive numbers — VERDICT
# #2), then the HU un-freeze re-run (VERDICT #4), then solver-anchor
# scoring of the new artifacts (VERDICT #6).
#
# ADVICE fixes vs the r4k queue: run_job re-checks the deadline AFTER
# wait_tunnel returns (a multi-hour outage can no longer launch a stale
# full-length job into the driver's bench window); commit_artifacts
# uses `git add -f` with stderr visible (the .gitignore rules for
# *.ckpt.npz/*.progress.json/logs/ silently ate the es7 recovery
# artifacts in round 4); the bench preview is gated on rc==0 AND the
# line parsing as JSON. A `.queue_stop` file in the repo root aborts
# between jobs.
#
#   setsid nohup bash scripts/tpu_queue_r5a.sh > logs/tpu_queue_r5a.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue_r5a.pid

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
    echo "r5a: tunnel down, probe $n $(date -u +%H:%M:%S)"
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
  echo "r5a: committed ${have[*]}"
}

check_stop() {
  if [ -f /root/repo/.queue_stop ]; then
    echo "r5a: .queue_stop present, exiting $(date -u +%H:%M:%S)"
    exit 0
  fi
}

run_job() {  # name deadline_epoch cmd...
  local name="$1" deadline="$2"; shift 2
  check_stop
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5a: $name already done, skipping"
    return 0
  fi
  local now tmo
  now=$(date -u +%s)
  if [ $((deadline - now)) -lt 180 ]; then
    echo "r5a: <180s to deadline, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  wait_tunnel
  check_stop
  now=$(date -u +%s)          # re-check: the tunnel wait may have eaten
  tmo=$((deadline - now))     # the job's window (ADVICE r4 #2)
  if [ "$tmo" -lt 180 ]; then
    echo "r5a: deadline passed during tunnel wait, skipping $name"
    echo "cutoff" > "logs/q_${name}.rc"
    return 1
  fi
  echo "r5a: START $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5a: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 120   # chip settle
  return $rc
}

run_cpu() {  # name timeout cmd...  (no tunnel gating, no chip settle)
  local name="$1" tmo="$2"; shift 2
  check_stop
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "r5a: $name already done, skipping"
    return 0
  fi
  echo "r5a: START(cpu) $name tmo=${tmo}s $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "r5a: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  return $rc
}

recompose_summary() {  # tag
  local tag="${1//[^A-Za-z0-9_-]/_}"   # slashes/spaces break the log redirect
  local PANELS=(data/exploitability.json data/exploitability_hu.json)
  for f in data/exploitability_hu_es.json data/exploitability_hu_mix.json \
           data/exploitability_es4.json data/exploitability_es5.json \
           data/exploitability_es6.json data/exploitability_es7.json \
           data/exploitability_hu7.json; do
    [ -f "$f" ] && PANELS+=("$f")
  done
  local OPTS=()
  for f in data/exploitability_opt.json data/exploitability_opt_hu.json \
           data/exploitability_opt_hu_mix.json \
           data/exploitability_opt_es4.json data/exploitability_opt_es5.json \
           data/exploitability_opt_es6.json data/exploitability_opt_es7.json \
           data/exploitability_opt_hu7.json; do
    [ -f "$f" ] && OPTS+=("$f")
  done
  timeout 600 python scripts/exploitability_report.py \
    --panel "${PANELS[@]}" --opt "${OPTS[@]}" \
    --save data/exploitability_summary.json \
    > "logs/q_exp_report_${tag}.log" 2>&1 \
    || { echo "r5a: recompose FAILED ($tag), keeping old summary"; return 1; }
  commit_artifacts "Recompose exploitability summary ($tag)" \
    data/exploitability_summary.json
}

# ---- 1. Hygiene first, in a protected slot (VERDICT #3): the v2 kernel
# surgery (last_raiser lane, 24 features) has never been det-pinned
# compiled-on-hardware; then warm the driver's bench cache.
run_job validate5 $((NOW + 2700)) python scripts/validate_tpu.py
commit_artifacts "validate_tpu post-v2 on hardware (det pin, 24-feature parity, league routing)" \
  logs/q_validate5.log

run_job bench_a $((NOW + 3900)) python bench.py
if [ "$(cat logs/q_bench_a.rc 2>/dev/null)" = "0" ]; then
  if tail -1 logs/q_bench_a.log | python -c "import json,sys; json.loads(sys.stdin.read())"; then
    tail -1 logs/q_bench_a.log > data/bench_r5_preview.json
    commit_artifacts "bench preview r5 (cache warm + post-validate smoke)" \
      data/bench_r5_preview.json
  else
    echo "r5a: bench output is not JSON, preview NOT committed"
  fi
fi

# ---- 2. es7 to 250 generations (VERDICT #1). Same flags as the r4k
# launch (the checkpoint encodes center/best; the flags encode the pool
# and hyperparams) — resumes at gen 31.
run_job es7 $((NOW + 10800)) python scripts/train_es_kernel.py \
  --opponents "data/policy_6max_es3.npz,adaptive:3-0,adaptive:3-0@lone,adaptive:1-0,adaptive:1-0@lone,optbot:data/exploitability_opt.json:es3,random" \
  --adapt-every 15 --adapt-gens 8 --adapt-popsize 12 \
  --start data/policy_6max_es6.npz --soften 2 --save data/policy_6max_es7.npz \
  --generations 250 --tables 16384 --steps 256 \
  --sigma 0.05 --lr 0.05 --resume
commit_artifacts "es7 resumed to completion (v2-feature pool-ES, 250 gens)" \
  data/policy_6max_es7.npz data/policy_6max_es7.npz.ckpt.npz \
  data/policy_6max_es7.npz.progress.json logs/q_es7.log

# ---- 3. The honest attack battery on the finished es7.
run_cpu foldgate7_final 1200 python scripts/fold_gate_check.py \
  --subjects es7=data/policy_6max_es7.npz --save data/fold_gate_es7.json
commit_artifacts "fold-gate + v2-usage diagnostic for finished es7" \
  data/fold_gate_es7.json

run_job optbot_es7 $((NOW + 16200)) python scripts/opt_bot.py \
  --subjects es7=data/policy_6max_es7.npz --pairs 3:0,1:0,3:1:0,3:1 \
  --seed 57 --save data/exploitability_opt_es7.json
commit_artifacts "Adaptive CMA exploitability vs finished es7 (fresh seed, v2 rule space)" \
  data/exploitability_opt_es7.json

if [ -f data/exploitability_opt_es7.json ]; then
  run_job br_es7 $((NOW + 18900)) python scripts/train_br.py \
    --opponent es7=data/policy_6max_es7.npz \
    --start optbot:data/exploitability_opt_es7.json:es7 --soften 50 \
    --updates 300 --tables 4096 --save data/br_vs_es7.npz
  commit_artifacts "Learned BR vs es7 (warm-started from its CMA attacker)" \
    data/br_vs_es7.npz data/br_vs_es7.npz.result.json
fi

run_job probe_es7 $((NOW + 20400)) python scripts/exploit_probe.py \
  --subjects es7=data/policy_6max_es7.npz \
  --geometry both --save data/exploitability_es7.json
commit_artifacts "es7 static panel (both geometries)" \
  data/exploitability_es7.json

recompose_summary "finished es7, fresh attack battery"

# ---- 4. Provenance regen (VERDICT #2): REAL adaptive numbers for es5
# and es6 on a fresh seed; overwrites the copied es5 file.
run_job optbot_es5 $((NOW + 23400)) python scripts/opt_bot.py \
  --subjects es5=data/policy_6max_es5.npz --pairs 3:0,1:0 \
  --seed 61 --save data/exploitability_opt_es5.json
commit_artifacts "REAL es5 adaptive attack (regenerates the copied round-4 file)" \
  data/exploitability_opt_es5.json

run_job optbot_es6 $((NOW + 25800)) python scripts/opt_bot.py \
  --subjects es6=data/policy_6max_es6.npz --pairs 3:0,1:0 \
  --seed 63 --save data/exploitability_opt_es6.json
commit_artifacts "es6 adaptive attack (summary no longer static-only)" \
  data/exploitability_opt_es6.json

recompose_summary "real es5/es6 adaptive entries"

# ---- 5. HU un-freeze re-run (VERDICT #4): soften + v2 features +
# gradient pool training vs {its CMA attacker, self anchor, random}.
run_job hu7 $((NOW + 30000)) python scripts/train_mix.py \
  --seats 2 --start data/policy_hu_300.npz --soften 8 \
  --opponents 'optbot:data/exploitability_opt_hu.json:hu%0,self%-0.03,random%1.5' \
  --updates 300 --tables 8192 --lr 1e-3 --max-steps 24 \
  --save data/policy_hu7.npz
commit_artifacts "hu7: v2-feature gradient un-freeze of the HU line" \
  data/policy_hu7.npz

if [ -f data/policy_hu7.npz ]; then
  run_cpu foldgate_hu7 1800 python scripts/fold_gate_check.py \
    --subjects hu7=data/policy_hu7.npz --save data/fold_gate_hu7.json
  commit_artifacts "hu7 fold-gate + v2-usage diagnostic" data/fold_gate_hu7.json
  run_job probe_hu7 $((NOW + 32400)) python scripts/exploit_probe.py \
    --subjects hu7=data/policy_hu7.npz --seats 2 \
    --geometry both --save data/exploitability_hu7.json
  commit_artifacts "hu7 panel probe" data/exploitability_hu7.json
  run_job optbot_hu7 $((NOW + 34800)) python scripts/opt_bot.py \
    --subjects hu7=data/policy_hu7.npz --pairs 3:0,1:0 --seats 2 \
    --seed 67 --save data/exploitability_opt_hu7.json
  commit_artifacts "Adaptive CMA exploitability vs hu7" \
    data/exploitability_opt_hu7.json
  recompose_summary "hu7 attack battery"
fi

echo "r5a: ALL DONE $(date -u +%H:%M:%S)"
