"""Secondary benchmark: random-policy self-play hands/sec (config 4 shape).

Prints one JSON line (not the driver's headline metric — that's bench.py).
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

from montecarlo_tpu.engine.state import TableConfig  # noqa: E402
from montecarlo_tpu.rollout.selfplay import play_hands  # noqa: E402


def main():
    cfg = TableConfig(num_seats=6)  # default L=12/PL=24; overflow flags monitored
    n = 1 << 20
    keys = jax.random.split(jax.random.key(1), n)
    final = play_hands(keys, cfg, num_hands=1)
    _ = int(final.time.sum())  # warm + host sync

    keys = jax.random.split(jax.random.key(2), n)
    t0 = time.perf_counter()
    final = play_hands(keys, cfg, num_hands=1)
    done = float(jnp.mean(final.hand_over.astype(jnp.float32)))
    actions = int(final.time.sum())
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "selfplay_full_hands_per_sec",
        "value": n / dt,
        "unit": "hands/s",
        "tables": n,
        "completed_frac": done,
        "actions_per_sec": actions / dt,
        "seconds": dt,
    }))


if __name__ == "__main__":
    main()
