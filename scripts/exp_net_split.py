"""Component ablation of the in-kernel policy-net step (~107 ns r2).

Monkeypatches module-level pieces (the Gumbel sampler, the feature
builder, the in-feature packed eval, the whole net action) to find where
the 35x-over-random-policy cost actually sits, at full production shape
(64k tables x 256 steps). Variants change semantics — measurement only.
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

N_TABLES = 1 << 16
N_STEPS = 256


def main():
    cfg = TableConfig(num_seats=6, rules="standard")
    P = cfg.num_seats
    params = load_params("data/policy_6max_200.npz")
    weights = (
        jnp.asarray(params.w1.T, jnp.float32),
        jnp.asarray(params.b1, jnp.float32).reshape(-1, 1),
        jnp.asarray(params.w2.T, jnp.float32),
        jnp.asarray(params.b2, jnp.float32).reshape(-1, 1),
        jnp.asarray(params.w3.T, jnp.float32),
        jnp.asarray(params.b3, jnp.float32).reshape(-1, 1),
    )
    keys = jax.random.split(jax.random.key(0), N_TABLES)
    decks = jax.vmap(lambda k: jax.random.permutation(k, 52))(keys)
    base = 2 * P
    pos = list(range(base)) + [base + 1, base + 2, base + 3, base + 5,
                               base + 7]
    state0 = jax.device_put(pe.pack_state(cfg, np.asarray(decks)[:, pos]))

    def measure(tag):
        pe.run_net_eval.clear_cache()

        def once(seed):
            t0 = time.perf_counter()
            out = pe.run_net_eval(seed, state0, weights, P, N_STEPS,
                                  cfg.small_blind, cfg.big_blind,
                                  cfg.starting_stack, cfg.rules,
                                  net_seats=1)
            hands = int(jnp.sum(pe.unpack_field(out, cfg, "hand_ct")))
            return time.perf_counter() - t0, hands

        once(0)
        dt, hands = min(once(i + 1) for i in range(3))
        ns = dt / (N_TABLES * N_STEPS) * 1e9
        print(json.dumps({"variant": tag, "ns_per_table_step": ns,
                          "hands": hands,
                          "hands_per_sec": hands / dt}), flush=True)

    measure("full")

    real_g = pe._gumbel_pick
    pe._gumbel_pick = lambda logits: jnp.min(
        jnp.where(logits == jnp.max(logits, axis=0)[None],
                  pe._iota(logits.shape[0]), logits.shape[0]), axis=0)
    measure("stub_gumbel")
    pe._gumbel_pick = real_g

    import montecarlo_tpu.ops.evaluator as ev
    real_eval = ev.eval_masks_impl
    ev.eval_masks_impl = lambda m0, m1, m2, m3: m0
    measure("stub_feat_eval")
    ev.eval_masks_impl = real_eval

    real_f = pe._features
    pe._features = lambda st, head, P, bb: [
        jnp.zeros(pe.TILE, jnp.float32)] * 20
    measure("stub_features")
    pe._features = real_f

    real_n = pe._net_action
    pe._net_action = lambda st, head, P, sb, bb, w_refs: jnp.zeros(
        pe.TILE, jnp.int32)
    measure("stub_net")
    pe._net_action = real_n
    pe.run_net_eval.clear_cache()


if __name__ == "__main__":
    main()
