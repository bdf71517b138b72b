"""Benchmark: full-hand Monte Carlo rollout throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (README.md:9 aspires to "reasonably
performant"; BASELINE.json published == {}), so vs_baseline is measured
against the BASELINE.json north-star target of 1e8 full-hand rollouts/sec
(value / 1e8). One rollout = deal a random 5-card board from the live deck,
rank both 7-card hands with the bitmask evaluator, compare, and reduce —
the hot path of the equity API (BASELINE configs 3/5).

Extra diagnostics go to stderr; the stdout contract stays one line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.cards import make_card
from montecarlo_tpu.rollout.equity import _equity_vs_hand_device

NORTH_STAR = 1e8  # rollouts/sec on a v4-8 class part (BASELINE.json)


def main():
    hero = jnp.array([make_card(0, 14), make_card(0, 13)], jnp.int32)    # AKs
    villain = jnp.array([make_card(1, 12), make_card(2, 12)], jnp.int32)  # QQ

    batch = 1 << 21
    n_chunks = 256
    n = batch * n_chunks
    key = jax.random.key(0)

    # Warmup / compile (int() forces a host round-trip: block_until_ready
    # alone does not synchronize through the axon tunnel).
    w, t = _equity_vs_hand_device(key, hero, villain, batch, n_chunks)
    _ = int(w) + int(t)

    reps = 3
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        w, t = _equity_vs_hand_device(
            jax.random.fold_in(key, i), hero, villain, batch, n_chunks)
        _ = int(w) + int(t)
        best = min(best, time.perf_counter() - t0)

    rate = n / best
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "rollouts": n,
        "seconds": best,
        "equity_AKs_vs_QQ": (int(w) + 0.5 * int(t)) / n,
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "full_hand_rollouts_per_sec",
        "value": rate,
        "unit": "rollouts/s",
        "vs_baseline": rate / NORTH_STAR,
    }))


if __name__ == "__main__":
    main()
