"""Whole-step Pallas engine kernel on hardware: smoke + throughput.

Usage: python scripts/bench_kernel_engine.py [--tables 1048576] [--steps 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from montecarlo_tpu.engine.state import TableConfig  # noqa: E402
from montecarlo_tpu.ops.pallas_engine import (  # noqa: E402
    selfplay_perpetual_kernel,
    unpack_field,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--rules", default="reference",
                    choices=["reference", "standard"])
    args = ap.parse_args()
    cfg = TableConfig(num_seats=6, rules=args.rules)

    if args.smoke:
        t0 = time.perf_counter()
        state, hands, ovf = selfplay_perpetual_kernel(
            3, cfg, 1024, 64, steps_per_launch=64)
        print(json.dumps({
            "mode": "smoke", "tables": 1024, "steps": 64,
            "hands": hands, "overflow_tables": ovf,
            "steps_per_hand": 1024 * 64 / max(hands, 1),
            "mean_stack": float(jnp.mean(jnp.stack(
                [unpack_field(state, cfg, "stacks", k).astype(jnp.float32)
                 for k in range(6)]))),
            "compile_plus_run_s": time.perf_counter() - t0,
        }), flush=True)
        return

    # Build the initial packed state ONCE (first-deal init pulls decks
    # through the device tunnel — steady-state throughput is the kernel).
    import numpy as np

    from montecarlo_tpu.ops.pallas_engine import (
        pack_state,
        run_perpetual_prng,
    )

    P = cfg.num_seats
    keys = jax.random.split(jax.random.key(0), args.tables)
    decks = jax.vmap(lambda k: jax.random.permutation(k, 52))(keys)
    base = 2 * P
    pos = list(range(base)) + [base + 1, base + 2, base + 3, base + 5,
                               base + 7]
    state0 = pack_state(cfg, np.asarray(decks)[:, pos])
    state0 = jax.device_put(state0)

    def once(seed):
        t0 = time.perf_counter()
        out = run_perpetual_prng(seed, state0, P, args.steps,
                                 cfg.small_blind, cfg.big_blind,
                                 rules=cfg.rules)
        hands = int(jnp.sum(unpack_field(out, cfg, "hand_ct")))
        dt = time.perf_counter() - t0
        ovf = int(jnp.sum(unpack_field(out, cfg, "overflow")))
        assert ovf == 0, f"{ovf} tables latched street overflow"
        return dt, hands

    once(0)  # warmup/compile
    dt, hands = min(once(i + 1) for i in range(3))
    print(json.dumps({
        "mode": "kernel_perpetual", "rules": args.rules,
        "tables": args.tables, "steps": args.steps,
        "hands_completed": hands,
        "steps_per_hand": args.tables * args.steps / max(hands, 1),
        "hands_per_sec": hands / dt,
        "ns_per_table_step": dt / (args.tables * args.steps) * 1e9,
        "seconds": dt,
    }), flush=True)


if __name__ == "__main__":
    main()
