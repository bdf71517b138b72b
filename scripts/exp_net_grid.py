"""Localize the net-eval kernel's per-step cost vs the engine kernel.

The round-3 ablation (exp_net_split.py, 64k tables) pinned the MLP at
~0.8 ns/table-step but left ~9 ns in the "engine part" of the net-eval
kernel while the pure engine kernel runs its step at ~0.55-2 ns. This
sweep separates the candidate causes on hardware, one axis at a time:

  - grid size (64 vs 256 vs 1024 blocks: pipeline amortization),
  - rules ("standard" exact-conservation settle vs "reference"),
  - per-hand stack reset (eval semantics) vs perpetual,
  - net kernel with random-only policy vs the plain engine kernel
    (the residual = net-kernel body overhead, not the MLP).

Measurement only; warm timings with host round-trip sync (CLAUDE.md).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_net_grid.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from montecarlo_tpu.engine.state import TableConfig  # noqa: E402
from montecarlo_tpu.models.policy_net import load_params  # noqa: E402
from montecarlo_tpu.ops import pallas_engine as pe  # noqa: E402

N_STEPS = 512
REPS = 3


def kernel_weights(params):
    return (
        jnp.asarray(params.w1.T, jnp.float32),
        jnp.asarray(params.b1, jnp.float32).reshape(-1, 1),
        jnp.asarray(params.w2.T, jnp.float32),
        jnp.asarray(params.b2, jnp.float32).reshape(-1, 1),
        jnp.asarray(params.w3.T, jnp.float32),
        jnp.asarray(params.b3, jnp.float32).reshape(-1, 1),
    )


def timed(fn, n_tables):
    def once(seed):
        t0 = time.perf_counter()
        out = fn(seed)
        h = int(jnp.sum(out))  # host round-trip = tunnel sync
        dt = time.perf_counter() - t0
        assert h > 0
        return dt

    once(0)  # warmup/compile
    best = min(once(i + 1) for i in range(REPS))
    return best / (n_tables * N_STEPS) * 1e9  # ns/table-step


def main():
    results = {}

    def report(tag, ns):
        results[tag] = round(ns, 3)
        print(json.dumps({tag: results[tag]}), flush=True)

    params = load_params("data/policy_6max_200.npz")
    weights = kernel_weights(params)

    for rules in ("standard", "reference"):
        cfg = TableConfig(num_seats=6, rules=rules)
        P = cfg.num_seats
        for log2_tables in (16, 18, 20):
            n_tables = 1 << log2_tables
            state0 = pe.initial_packed_state(7, cfg, n_tables)

            def net_fn(seed, state0=state0, cfg=cfg, reset=True):
                out = pe.run_net_eval(seed, state0, weights, P, N_STEPS,
                                      cfg.small_blind, cfg.big_blind,
                                      cfg.starting_stack, cfg.rules,
                                      net_seats=1, reset_stacks=reset)
                return pe.unpack_field(out, cfg, "hand_ct")

            report(f"net[{rules},2^{log2_tables},reset]",
                   timed(net_fn, n_tables))

            def eng_fn(seed, state0=state0, cfg=cfg):
                out = pe.run_perpetual_prng(seed, state0, P, N_STEPS,
                                            cfg.small_blind, cfg.big_blind,
                                            rules=cfg.rules)
                return pe.unpack_field(out, cfg, "hand_ct")

            report(f"engine[{rules},2^{log2_tables}]",
                   timed(eng_fn, n_tables))

            if log2_tables == 18:
                def net_noreset(seed, state0=state0, cfg=cfg):
                    return net_fn(seed, state0=state0, cfg=cfg, reset=False)

                report(f"net[{rules},2^18,noreset]",
                       timed(net_noreset, n_tables))

    with open("data/exp_net_grid.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
