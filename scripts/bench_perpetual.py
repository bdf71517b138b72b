"""Measure perpetual-table throughput vs the per-hand masked scan.

play_hands pays hand_action_bound (72 for 6-max) step_action steps per hand
— most masked no-ops once the hand ends. A perpetual scan of step_table
(settle + redeal fused into the step) completes one hand every ~E[actions]
steps on every lane with zero masked tail, at a higher per-step price
(showdown + deal computed every step). This prints both, plus the measured
steps/hand, to decide the selfplay architecture.
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

from functools import partial  # noqa: E402

from montecarlo_tpu.engine.state import TableConfig, init_state  # noqa: E402
from montecarlo_tpu.engine.step import clamp_action, step_table  # noqa: E402
from montecarlo_tpu.rollout.policy import random_policy  # noqa: E402
from montecarlo_tpu.rollout.selfplay import play_hands  # noqa: E402

I32 = jnp.int32


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def perpetual_scan(keys, cfg, n_steps: int):
    def one_table(key):
        st = init_state(key, cfg)

        def body(carry, k):
            st, street_raises = carry
            action = clamp_action(
                st, random_policy(k, st, street_raises))
            prev_stage, prev_idx = st.stage, st.hand_idx
            nxt = step_table(st, action, rules=cfg.rules)
            applied = (action > 0) & ~st.hand_over
            street_raises = jnp.where(
                (nxt.stage != prev_stage) | (nxt.hand_idx != prev_idx),
                0, street_raises + applied)
            return (nxt, street_raises), None

        ks = jax.random.split(jax.random.fold_in(key, 7), n_steps)
        (final, _), _ = jax.lax.scan(body, (st, jnp.zeros((), I32)), ks)
        return final

    return jax.vmap(one_table)(keys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()
    cfg = TableConfig(num_seats=6)
    n = args.tables

    # Perpetual scan.
    def run_perp(seed):
        keys = jax.random.split(jax.random.key(seed), n)
        t0 = time.perf_counter()
        final = perpetual_scan(keys, cfg, args.steps)
        hands = int(final.hand_idx.sum())
        return time.perf_counter() - t0, hands

    run_perp(0)
    dt, hands = min(run_perp(i + 1) for i in range(3))
    steps_total = n * args.steps
    print(json.dumps({
        "mode": "perpetual_step_table",
        "tables": n, "steps": args.steps,
        "hands_completed": hands,
        "steps_per_hand": steps_total / max(hands, 1),
        "hands_per_sec": hands / dt,
        "table_steps_per_sec": steps_total / dt,
        "seconds": dt,
    }), flush=True)

    # Reference: play_hands masked per-hand scan.
    def run_ph(seed):
        keys = jax.random.split(jax.random.key(seed), n)
        t0 = time.perf_counter()
        final = play_hands(keys, cfg, num_hands=1)
        done = int(final.time.sum())
        assert done > 0
        return time.perf_counter() - t0

    run_ph(0)
    dt2 = min(run_ph(i + 1) for i in range(3))
    print(json.dumps({
        "mode": "play_hands(num_hands=1, 72-step scan)",
        "tables": n,
        "hands_per_sec": n / dt2,
        "table_steps_per_sec": n * 72 / dt2,
        "seconds": dt2,
    }), flush=True)


if __name__ == "__main__":
    main()
