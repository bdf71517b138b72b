"""A/B the cheap hands/s levers on the real perpetual program.

Variants (all 2^20 six-max tables, random policy, reference rules):
  base        : L=8/PL=16, 1 action per scan body   (bench.py shape)
  caps6       : L=6/PL=12 (audited zero-overflow envelope)
  body2       : L=8/PL=16, 2 actions per scan body (halves carry round-trips)
  caps6+body2 : both

Each run asserts the overflow latch stayed clear, so a too-tight cap fails
loudly instead of dropping side pots.
"""

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

I32 = jnp.int32
N_TABLES = 1 << 20
N_STEPS = 128  # total actions per table (body2 scans N_STEPS//2 iterations)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "actions_per_body"))
def perpetual(keys, cfg, n_steps: int, actions_per_body: int = 1):
    def one_table(key):
        st = init_state(key, cfg)

        def one_action(carry, k):
            st, street_raises = carry
            action = clamp_action(st, random_policy(k, st, street_raises))
            prev_stage, prev_idx = st.stage, st.hand_idx
            nxt = step_table(st, action, rules=cfg.rules)
            applied = (action > 0) & ~st.hand_over
            street_raises = jnp.where(
                (nxt.stage != prev_stage) | (nxt.hand_idx != prev_idx),
                0, street_raises + applied)
            return (nxt, street_raises)

        def body(carry, ks):
            for j in range(actions_per_body):
                carry = one_action(carry, ks[j])
            return carry, None

        ks = jax.random.split(jax.random.fold_in(key, 7), n_steps)
        ks = ks.reshape(n_steps // actions_per_body, actions_per_body,
                        *ks.shape[1:])
        (final, _), _ = jax.lax.scan(body, (st, jnp.zeros((), I32)), ks)
        return final

    return jax.vmap(one_table)(keys)


def run(name, cfg, actions_per_body):
    def once(seed):
        keys = jax.random.split(jax.random.key(seed), N_TABLES)
        t0 = time.perf_counter()
        final = perpetual(keys, cfg, N_STEPS, actions_per_body)
        hands = int(final.hand_idx.sum())
        dt = time.perf_counter() - t0
        ovf = int(jnp.sum(final.bets.overflow | final.pots.overflow))
        assert ovf == 0, f"{name}: {ovf} overflowed tables"
        return dt, hands

    once(0)
    dt, hands = min(once(i + 1) for i in range(3))
    print(json.dumps({
        "variant": name,
        "hands_per_sec": hands / dt,
        "ns_per_table_step": dt / (N_TABLES * N_STEPS) * 1e9,
        "seconds": dt,
    }), flush=True)


def main():
    c8 = TableConfig(num_seats=6, max_layers=8, max_pot_layers=16)
    c6 = TableConfig(num_seats=6, max_layers=6, max_pot_layers=12)
    run("base L8/PL16 body1", c8, 1)
    run("caps6 L6/PL12 body1", c6, 1)
    run("body2 L8/PL16", c8, 2)
    run("caps6+body2", c6, 2)


if __name__ == "__main__":
    main()
