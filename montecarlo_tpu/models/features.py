"""Decision-point features for policy models.

Pure jnp on a single ``TableState`` (vmap for batches): everything the
acting seat may legally observe — public board state plus its own hole
cards — as a fixed-size float vector. Uses the bitmask evaluator on the
*revealed* cards for a made-hand-strength signal.
"""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_tpu.cards import NUM_RANKS
from montecarlo_tpu.engine.street import bets_needed, bets_total
from montecarlo_tpu.engine.state import TableState
from montecarlo_tpu.engine.step import _pick, head_info
from montecarlo_tpu.handval import CAT_SHIFT
from montecarlo_tpu.ops.evaluator import eval_masks_impl

I32 = jnp.int32
F32 = jnp.float32

NUM_FEATURES = 24


def _masked_suit_masks(cards, valid):
    """Suit masks from cards gated by a validity flag per card."""
    suits = cards // NUM_RANKS
    bits = jnp.left_shift(I32(1), (2 + cards % NUM_RANKS).astype(I32))
    masks = []
    for s in range(4):
        contrib = jnp.where(valid & (suits == s), bits, 0)
        m = jnp.zeros((), I32)
        for i in range(cards.shape[0]):
            m = m | contrib[i]
        masks.append(m)
    return masks


def state_features(state: TableState) -> jnp.ndarray:
    """[NUM_FEATURES] float32 feature vector for the current head seat."""
    P = state.num_seats
    seat, _, _ = head_info(state)

    pot = (bets_total(state.bets)
           + jnp.sum(jnp.where(jnp.arange(state.pots.capacity)
                               < state.pots.count, state.pots.amt, 0)))
    needed = bets_needed(state.bets, seat)
    stack = _pick(state.stacks, seat)
    bb = jnp.maximum(state.big_blind, 1)

    # Made-hand strength on revealed cards (hole + community[:n]).
    hole = jnp.where(jnp.arange(P)[:, None] == seat, state.hole, 0)
    hole = jnp.sum(hole, axis=0)  # [2], gather-free pick of the head's hole
    cards = jnp.concatenate([hole, state.community])
    valid = jnp.concatenate([
        jnp.ones((2,), jnp.bool_),
        jnp.arange(5) < state.n_community,
    ])
    key = eval_masks_impl(*_masked_suit_masks(cards, valid)).astype(jnp.uint32)
    category = (key >> CAT_SHIFT).astype(F32) / 8.0
    top_rank = ((key >> 16) & 0xF).astype(F32) / 14.0

    hole_ranks = (2 + hole % NUM_RANKS).astype(F32) / 14.0
    suited = (hole[0] // NUM_RANKS == hole[1] // NUM_RANKS).astype(F32)
    paired = (hole[0] % NUM_RANKS == hole[1] % NUM_RANKS).astype(F32)

    stage_onehot = (jnp.arange(4) == state.stage).astype(F32)

    # Betting-history features (feature-set v2 — the leak-anatomy lever:
    # without raise counts / the aggressor, relentless thin value-raising
    # is indistinguishable from passivity and value-callers farm it).
    sr = state.street_raises
    has_aggr = sr > 0
    rel_raiser = jnp.where(
        has_aggr, ((state.last_raiser - seat) % P).astype(F32) / P, 0.0)

    feats = jnp.concatenate([
        stage_onehot,                                        # 4
        jnp.stack([
            state.n_community.astype(F32) / 5.0,
            pot.astype(F32) / (100.0 * P),
            needed.astype(F32) / 100.0,
            stack.astype(F32) / 100.0,
            (needed == 0).astype(F32),                       # free to check
            jnp.sum(state.in_hand).astype(F32) / P,
            jnp.sum(state.to_act).astype(F32) / P,
            seat.astype(F32) / P,
            (pot / jnp.maximum(needed + pot, 1)).astype(F32),  # pot odds
            needed.astype(F32) / bb.astype(F32) / 10.0,
            category,
            top_rank,
            hole_ranks[0],
            hole_ranks[1],
            suited,
            paired,
            # --- feature-set v2 (indices 20-23; older artifacts load
            # with zero-padded w1 rows, so their play is unchanged) ---
            sr.astype(F32) / 4.0,                            # street raises
            has_aggr.astype(F32),                            # facing a raiser
            rel_raiser,                                      # raiser distance
            (sr >= 2).astype(F32),                           # re-raised street
        ]),                                                  # 20
    ])
    return feats
