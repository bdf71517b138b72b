"""Component ablation of the engine kernel step at FULL grid (1024 blocks).

The round-2 ablation ran at 32 blocks, where a fixed per-iteration latency
(~4 ns) masked everything and led to the "carry floor" theory. The carry
micro-benchmark (exp_carry_model.py) showed the 141-row carry costs only
~0.27 ns/table-step at 1024 blocks — so the ~2.95 ns step is compute.
This script stubs one component at a time (monkeypatching module-level
pieces of ops.pallas_engine) and measures where the time actually goes.

Each variant recompiles the kernel (~minutes through the tunnel); run in
the background. Variants change semantics — measurement only.
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
from montecarlo_tpu.ops import pallas_engine as pe  # noqa: E402

N_TABLES = 1 << 20
N_STEPS = 512


def build_state(cfg):
    P = cfg.num_seats
    keys = jax.random.split(jax.random.key(0), N_TABLES)
    decks = jax.vmap(lambda k: jax.random.permutation(k, 52))(keys)
    base = 2 * P
    pos = list(range(base)) + [base + 1, base + 2, base + 3, base + 5,
                               base + 7]
    return jax.device_put(pe.pack_state(cfg, np.asarray(decks)[:, pos]))


def measure(cfg, state0, tag):
    P = cfg.num_seats

    def once(seed):
        t0 = time.perf_counter()
        out = pe.run_perpetual_prng(seed + hash(tag) % 1000, state0, P,
                                    N_STEPS, cfg.small_blind, cfg.big_blind,
                                    rules=cfg.rules)
        hands = int(jnp.sum(pe.unpack_field(out, cfg, "hand_ct")))
        return time.perf_counter() - t0, hands

    once(0)
    dt, hands = min(once(i + 1) for i in range(3))
    ns = dt / (N_TABLES * N_STEPS) * 1e9
    print(json.dumps({"variant": tag, "ns_per_table_step": ns,
                      "hands": hands}), flush=True)
    return ns


def main():
    cfg = TableConfig(num_seats=6)
    state0 = build_state(cfg)

    # jit caches key on the traced program; monkeypatches change the trace,
    # but run_perpetual_prng's jit cache would return stale executables for
    # identical static args. Clear between variants.
    def fresh():
        pe.run_perpetual_prng.clear_cache()

    measure(cfg, state0, "full")

    # 1) settle stubbed: payout = 0 (no eval, no [4,L,P] winner tensors)
    real_settle = pe._settle_payout
    pe._settle_payout = lambda st, pa, ps, pn, ih, P, ref: (
        jnp.zeros_like(st["stacks"]))
    fresh()
    measure(cfg, state0, "stub_settle")
    pe._settle_payout = real_settle

    # 2) eval stubbed inside settle: values = stacks (keeps the winner
    #    tensors, drops mask build + cmp eval) -> settle minus eval cost
    import montecarlo_tpu.ops.evaluator as ev
    real_eval = ev.eval_masks_cmp_impl
    ev.eval_masks_cmp_impl = lambda m0, m1, m2, m3: m0
    fresh()
    measure(cfg, state0, "stub_eval")
    ev.eval_masks_cmp_impl = real_eval

    # 3) deal stubbed: next-hand cards all zero (17 PRNG draws + bubble
    #    insertion removed)
    real_sample = pe._sample_cards
    pe._sample_cards = lambda shape, k: jnp.zeros((k,) + shape, jnp.int32)
    fresh()
    measure(cfg, state0, "stub_deal")
    pe._sample_cards = real_sample

    # 4) policy stubbed: always check/call
    real_policy = pe._policy_prng
    pe._policy_prng = lambda st, P: jnp.zeros(pe.TILE, jnp.int32)
    fresh()
    measure(cfg, state0, "stub_policy")
    pe._policy_prng = real_policy

    # 5) street algebra stubbed: update/merge become identity
    real_upd, real_mrg = pe._street_update, pe._street_merge
    pe._street_update = lambda lvl, ln, amount, do: (
        lvl, ln, jnp.zeros(pe.TILE, jnp.int32) != 0)
    pe._street_merge = lambda lvl, ln, contrib, do: (lvl, ln)
    fresh()
    measure(cfg, state0, "stub_street")
    pe._street_update, pe._street_merge = real_upd, real_mrg
    fresh()


if __name__ == "__main__":
    main()
