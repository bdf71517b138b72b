"""A/B the levels street form vs the literal layer algebra on the real
perpetual program (2^20 six-max tables, reference rules, L=8/PL=16)."""

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
from montecarlo_tpu.rollout.selfplay import play_hands_perpetual  # noqa: E402

N_TABLES = 1 << 20
N_STEPS = 128


def run(name, cfg):
    def once(seed):
        keys = jax.random.split(jax.random.key(seed), N_TABLES)
        t0 = time.perf_counter()
        final, hands = play_hands_perpetual(keys, cfg, N_STEPS)
        h = int(hands)
        dt = time.perf_counter() - t0
        assert int(jnp.sum(final.bets.overflow | final.pots.overflow)) == 0
        return dt, h

    once(0)
    dt, hands = min(once(i + 1) for i in range(3))
    print(json.dumps({
        "variant": name,
        "hands_per_sec": hands / dt,
        "ns_per_table_step": dt / (N_TABLES * N_STEPS) * 1e9,
        "hands": hands, "seconds": dt,
    }), flush=True)
    return hands


def main():
    base = dict(num_seats=6, max_layers=8, max_pot_layers=16)
    h_layers = run("layers", TableConfig(bets_impl="layers", **base))
    h_levels = run("levels", TableConfig(bets_impl="levels", **base))
    # Same keys + trajectory-equal algebra => identical hand counts.
    assert h_layers == h_levels, (h_layers, h_levels)
    print(json.dumps({"hands_equal": True}), flush=True)


if __name__ == "__main__":
    main()
