"""Bisect Mosaic compile time of the whole-step engine kernel.

Compiles pallas kernels containing increasing subsets of the step body,
printing wall time per stage. Run on the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_tpu.engine.state import TableConfig
from montecarlo_tpu.ops import pallas_engine as pe

I32 = jnp.int32
P = 6
cfg = TableConfig(num_seats=P)
layout, F = pe._field_layout(P)


def compile_variant(name, body_fn, n_steps=256, n_blocks=32):
    def kernel(seed_ref, state_ref, out_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        st = pe._unpack(state_ref[0], layout)
        st = jax.lax.fori_loop(0, n_steps, lambda i, s: body_fn(s), st)
        out_ref[0] = pe._pack(st, layout, F)

    state_spec = pl.BlockSpec((1, F) + pe.TILE, lambda i: (i, 0, 0, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = jax.jit(pl.pallas_call(
        kernel, grid=(n_blocks,), in_specs=[smem, state_spec],
        out_specs=state_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, F) + pe.TILE, I32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    ))
    import numpy as np
    rng = np.random.default_rng(0)
    n_tables = n_blocks * pe.TABLES_PER_BLOCK
    first = np.argsort(rng.random((n_tables, 52)),
                       axis=-1)[:, :2 * P + 5]
    state = pe.pack_state(cfg, first)
    seed = jnp.zeros((1,), I32)
    t0 = time.time()
    out = call(seed, state)
    _ = int(jnp.sum(out[:, 0, 0, 0]))  # tunnel sync
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = call(seed, state)
        _ = int(jnp.sum(out[:, 0, 0, 0]))
        best = min(best, time.time() - t0)
    ns = best / (n_tables * n_steps) * 1e9
    print(f"{name}: compile {compile_s:.1f}s, {ns:.2f} ns/table-step",
          flush=True)


def v_carry(st):
    st = dict(st)
    st["hand_ct"] = st["hand_ct"] + 1
    return st


def v_policy(st):
    raw = pe._policy_prng(st, P)
    st = dict(st)
    st["street_raises"] = st["street_raises"] + (raw > 0)
    return st


def v_street(st):
    raw = pe._policy_prng(st, P)
    head, cursor_after, exists = pe._head_info(st, P)
    total = pe._street_total(st["lvl"])
    amount = jnp.maximum(raw, 0) + total
    up_lvl, up_ln, ovf = pe._street_update(st["lvl"], st["ln"], amount,
                                           raw > 0)
    mg_lvl, mg_ln = pe._street_merge(st["lvl"], st["ln"], st["contrib"],
                                     raw < 0)
    st = dict(st)
    st["lvl"] = jnp.where((raw < 0)[None], mg_lvl, up_lvl)
    st["ln"] = jnp.where((raw < 0)[None], mg_ln, up_ln)
    st["overflow"] = st["overflow"] | ovf.astype(I32)
    return st


def v_deal(st):
    cards = pe._sample_cards(pe.TILE, 2 * P + 5)
    st = dict(st)
    st["hole0"] = cards[:P]
    st["hole1"] = cards[P:2 * P]
    st["board"] = cards[2 * P:]
    return st


def v_settle(st):
    from montecarlo_tpu.ops.evaluator import eval_masks_cmp_impl
    board_masks = pe._suit_masks([st["board"][i] for i in range(5)])
    hole_masks = pe._suit_masks([st["hole0"], st["hole1"]])
    values = eval_masks_cmp_impl(*[b[None] | h for b, h
                                   in zip(board_masks, hole_masks)])
    n_lvl = pe._L_for(cfg.rules)
    pots_amt = st["pot_amt"].reshape(4, n_lvl, *pe.TILE)
    pots_mem = st["pot_set"].reshape(4, n_lvl, *pe.TILE)
    pots_n = st["pot_n"].reshape(4, n_lvl, *pe.TILE)
    in_hand_b = pe._mask_bits(st["in_hand"], P) != 0
    elig = ((jnp.right_shift(pots_mem[:, :, None],
                             pe._iota(P)[None, None]) & 1) != 0) \
        & in_hand_b[None, None]
    vmax = jnp.max(jnp.where(elig, values[None, None], 0), axis=2)
    winners = elig & (values[None, None] == vmax[:, :, None])
    cnt = jnp.sum(winners.astype(I32), axis=2)
    share = jnp.where(cnt > 0, (pots_amt * pots_n) // jnp.maximum(cnt, 1), 0)
    payout = jnp.sum(jnp.where(winners, share[:, :, None], 0), axis=(0, 1))
    st = dict(st)
    st["stacks"] = st["stacks"] + payout
    return st


def v_full(st):
    raw = pe._policy_prng(st, P)
    cards = pe._sample_cards(pe.TILE, 2 * P + 5)
    return pe._engine_step(st, raw, cards, P, cfg.small_blind, cfg.big_blind)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = {
        "carry": v_carry, "policy": v_policy, "street": v_street,
        "deal": v_deal, "settle": v_settle, "full": v_full,
    }
    for name, fn in variants.items():
        if which in ("all", name):
            compile_variant(name, fn)
