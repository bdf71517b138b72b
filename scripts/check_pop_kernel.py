"""On-TPU check: the population-batched net-eval kernel reproduces the
per-candidate kernel EXACTLY (same seed => same PRNG stream per block, so
candidate c of one pop launch must equal a single-candidate launch with
c's weights — meters and all).

    python scripts/check_pop_kernel.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from montecarlo_tpu.engine.state import TableConfig  # noqa: E402
from montecarlo_tpu.models.policy_net import init_params, load_params  # noqa: E402
from montecarlo_tpu.ops.pallas_engine import (  # noqa: E402
    initial_packed_state, selfplay_net_eval_kernel, selfplay_net_eval_pop,
)


def main():
    cfg = TableConfig(num_seats=6, rules="standard")
    n_tables = 4096
    n_steps = 256
    seed = 314

    cands = [
        load_params("data/policy_6max_es.npz"),
        load_params("data/policy_6max_200.npz"),
        init_params(jax.random.key(7)),
        init_params(jax.random.key(8)),
    ]
    state0 = initial_packed_state(seed, cfg, n_tables)

    t0 = time.perf_counter()
    pm, pe_, ph = selfplay_net_eval_pop(
        seed, cfg, cands, net_seats=1, n_tables=n_tables,
        n_steps=n_steps, state0=state0)
    t_pop = time.perf_counter() - t0

    ok = True
    t_single = 0.0
    for c, p in enumerate(cands):
        t0 = time.perf_counter()
        m, e, h = selfplay_net_eval_kernel(
            seed, cfg, p, net_seats=1, n_tables=n_tables,
            n_steps=n_steps, state0=state0)
        t_single += time.perf_counter() - t0
        exact = bool(np.all(m == pm[c]) and h == ph[c])
        ok &= exact
        print(json.dumps({
            "candidate": c, "bb_seat0_pop": round(float(pm[c][0]), 4),
            "bb_seat0_single": round(float(m[0]), 4),
            "hands_pop": int(ph[c]), "hands_single": int(h),
            "exact": exact}), flush=True)

    print(json.dumps({
        "pop_launch_s": round(t_pop, 3),
        "four_single_launches_s": round(t_single, 3),
        "speedup": round(t_single / t_pop, 2),
        "ok": ok}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
