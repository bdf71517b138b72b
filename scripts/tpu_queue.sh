#!/bin/bash
# Round-4 TPU job queue: wait for the axon tunnel to recover, then run
# the verdict-mandated TPU jobs sequentially (ONE chip job at a time —
# overlapping runs contend through the tunnel; CLAUDE.md).
#
# Each job: timeout-bounded, logs to logs/q_<name>.log, rc recorded in
# logs/q_<name>.rc. Training jobs get one --resume retry (silent tunnel
# deaths happen; the trainers checkpoint).
#
#   setsid nohup bash scripts/tpu_queue.sh > logs/tpu_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p logs
echo "$$" > /tmp/tpu_queue.pid

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
    echo "queue: tunnel down, probe $n $(date -u +%H:%M:%S)"
    sleep 240
  done
  echo "queue: tunnel UP $(date -u +%H:%M:%S)"
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/q_${name}.rc" ] && [ "$(cat logs/q_${name}.rc)" = "0" ]; then
    echo "queue: $name already done, skipping"
    return 0
  fi
  wait_tunnel
  echo "queue: START $name $(date -u +%H:%M:%S) :: $*"
  timeout "$tmo" "$@" > "logs/q_${name}.log" 2>&1
  local rc=$?
  echo "$rc" > "logs/q_${name}.rc"
  echo "queue: DONE $name rc=$rc $(date -u +%H:%M:%S)"
  sleep 150   # let the chip settle (kill mid-run can wedge ~2 min)
  return $rc
}

# 1. Headline bench (BENCH_r04 preview; now carries the net axis).
run_job bench 2700 python bench.py

# 2. On-hardware kernel agreement incl. the det-net section.
run_job validate 3600 python scripts/validate_tpu.py

# 3. Adaptive rule-bot exploitability (CMA-ES) vs es3 + es2.
# Tightened after the 4h tunnel outage: timeouts cap each job so the
# post-recovery window is shared; partial saves keep finished searches.
run_job optbot 7200 python scripts/opt_bot.py \
  --subjects es3=data/policy_6max_es3.npz es2=data/policy_6max_es2.npz \
  --save data/exploitability_opt.json

# 4. Learned best response (REINFORCE exploiter) vs frozen es3.
run_job br_es3 7200 python scripts/train_br.py \
  --opponent es3=data/policy_6max_es3.npz --save data/br_vs_es3.npz

# 5. es4: opponent-pool ES, BOTH seat geometries in the fitness.
ES4_ARGS=(--opponents data/policy_6max_es3.npz,bot:jam_loose,bot:jam_loose@lone,bot:fof_call,bot:fof_call@lone,bot:jam_tight,random
  --start data/policy_6max_es3.npz --save data/policy_6max_es4.npz
  --generations 200 --tables 16384 --steps 256
  --sigma 0.05 --lr 0.05 --mask w2,b2,w3,b3)
run_job es4 9000 python scripts/train_es_kernel.py "${ES4_ARGS[@]}"

# 6. Probe es4 (and es3 control) in BOTH geometries.
run_job probe_es4 7200 python scripts/exploit_probe.py \
  --subjects es4=data/policy_6max_es4.npz es3=data/policy_6max_es3.npz \
  --geometry both --save data/exploitability_es4.json

# 7. HU hardening: pool-ES vs fof_raise (+random anchor), seats=2.
run_job hu_es 5400 python scripts/train_es_kernel.py \
  --seats 2 --opponents bot:fof_raise,random \
  --start data/policy_hu_300.npz --save data/policy_hu_es.npz \
  --generations 120 --tables 16384 --steps 256

# 8. Probe the hardened HU artifact.
run_job probe_hu 7200 python scripts/exploit_probe.py \
  --seats 2 --subjects hu_es=data/policy_hu_es.npz \
  hu=data/policy_hu_300.npz --geometry both \
  --save data/exploitability_hu_es.json

echo "queue: ALL DONE $(date -u +%H:%M:%S)"
