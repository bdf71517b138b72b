"""Branchless bitmask 7-card hand evaluator (pure jnp, vmap/jit-safe).

Replaces the reference's 21-combinations x 120-permutations showdown path
(``hand_evaluator.clj:162-172``, ``:71-79``) with O(1) bitwise arithmetic on
per-suit rank masks, provably producing the same packed key as the naive
max-over-combinations evaluator (cross-checked exhaustively in tests against
``ops.ref_evaluator``).

Representation: a hand is four int32 *suit masks*; bit ``r`` of mask ``s`` is
set iff the hand contains rank ``r`` (2..14) in suit ``s``. Every operation
below is elementwise, so the evaluator runs unvmapped on arbitrarily-shaped
mask arrays — the natural form for both the XLA path and the Pallas kernel.

The returned key is the packed ``[category hit-ranks kickers]`` format of
``montecarlo_tpu.handval`` whose integer order equals the reference's
lexicographic compare (``hand_evaluator.clj:156-160``), including the
no-wheel-straight quirk (``:32-40``; the ace only ever sets bit 14).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from montecarlo_tpu import handval as hv
from montecarlo_tpu.cards import NUM_RANKS

I32 = jnp.int32


def _msb(x):
    """Position of the highest set bit; -1 for x == 0 (elementwise)."""
    return 31 - jax.lax.clz(x.astype(I32))


def _bit(pos):
    """1 << pos, safe for pos == -1 (yields 0)."""
    return jnp.where(pos >= 0, jnp.left_shift(I32(1), jnp.maximum(pos, 0)), I32(0))


def _pop_msb(x):
    """(msb position, mask with that bit cleared)."""
    p = _msb(x)
    return p, x & ~_bit(p)


def _top_ranks(mask, k):
    """The k highest set-bit positions of mask, descending (0-padded)."""
    out = []
    for _ in range(k):
        p, mask = _pop_msb(mask)
        out.append(jnp.maximum(p, 0))
    return out


def _run5_top(mask):
    """Top rank of the best 5-long run of consecutive set bits (else -1)."""
    r = mask & (mask >> 1) & (mask >> 2) & (mask >> 3) & (mask >> 4)
    return jnp.where(r > 0, _msb(r) + 4, -1)


def _pack(cat, ranks):
    key = jnp.left_shift(cat.astype(jnp.uint32), hv.CAT_SHIFT)
    for i, r in enumerate(ranks):
        key = key | jnp.left_shift(r.astype(jnp.uint32), 16 - 4 * i)
    return key


def suit_masks_from_cards(cards):
    """[..., K] card ids -> four [...]-shaped int32 suit masks.

    Cards must be distinct within a hand; ids follow ``cards.py`` encoding.
    """
    suits = cards // NUM_RANKS
    rank_bits = jnp.left_shift(I32(1), (2 + cards % NUM_RANKS).astype(I32))
    masks = []
    for s in range(4):
        contrib = jnp.where(suits == s, rank_bits, I32(0))
        masks.append(
            functools.reduce(jnp.bitwise_or, jnp.moveaxis(contrib, -1, 0))
        )
    return masks


def eval_masks_impl(m0, m1, m2, m3):
    """Evaluate suit masks to the packed uint32 hand key (elementwise).

    Raw implementation — also called from inside Pallas kernels (every op
    is an elementwise VPU op, so it lowers directly to Mosaic).
    """
    zero = jnp.zeros_like(m0)
    present = m0 | m1 | m2 | m3

    # Exact-multiplicity rank masks from the four suit planes.
    c2p = (m0 & m1) | (m0 & m2) | (m0 & m3) | (m1 & m2) | (m1 & m3) | (m2 & m3)
    c3p = (m0 & m1 & m2) | (m0 & m1 & m3) | (m0 & m2 & m3) | (m1 & m2 & m3)
    c4 = m0 & m1 & m2 & m3
    trips = c3p & ~c4
    pairs = c2p & ~c3p

    # Straights (no wheel: ace only occupies bit 14).
    straight_top = _run5_top(present)
    has_straight = straight_top >= 0

    # Flush: at most one suit can hold >= 5 of 7 cards.
    fmask = zero
    for m in (m0, m1, m2, m3):
        fmask = fmask | jnp.where(jax.lax.population_count(m) >= 5, m, zero)
    has_flush = fmask != 0
    sf_top = _run5_top(fmask)
    has_sf = sf_top >= 0

    has_quads = c4 != 0
    n_trip_ranks = jax.lax.population_count(trips)
    has_fh = (trips != 0) & ((pairs != 0) | (n_trip_ranks >= 2))
    has_trips = trips != 0
    has_two_pair = jax.lax.population_count(pairs) >= 2
    has_pair = pairs != 0

    # Per-category 5-rank payloads (cheap elementwise arithmetic; the final
    # select keeps everything branch-free under vmap).
    sf_ranks = [jnp.maximum(sf_top - i, 0) for i in range(5)]

    q = jnp.maximum(_msb(c4), 0)
    qk = jnp.maximum(_msb(present & ~_bit(q)), 0)
    quad_ranks = [q, q, q, q, qk]

    t_fh = jnp.maximum(_msb(trips), 0)
    p_fh = jnp.maximum(_msb((trips | pairs) & ~_bit(t_fh)), 0)
    fh_ranks = [t_fh, t_fh, t_fh, p_fh, p_fh]

    flush_ranks = _top_ranks(fmask, 5)
    straight_ranks = [jnp.maximum(straight_top - i, 0) for i in range(5)]

    t = jnp.maximum(_msb(trips), 0)
    tk1, tk2 = _top_ranks(present & ~_bit(t), 2)
    trips_ranks = [t, t, t, tk1, tk2]

    hp, lp = _top_ranks(pairs, 2)
    tpk = jnp.maximum(_msb(present & ~_bit(hp) & ~_bit(lp)), 0)
    two_pair_ranks = [hp, hp, lp, lp, tpk]

    p1 = jnp.maximum(_msb(pairs), 0)
    pk1, pk2, pk3 = _top_ranks(present & ~_bit(p1), 3)
    pair_ranks = [p1, p1, pk1, pk2, pk3]

    high_ranks = _top_ranks(present, 5)

    # Priority select, highest category first (mirrors the decision cascade
    # of hand_evaluator.clj:112-133).
    table = [
        (has_sf, hv.CAT_STRAIGHT_FLUSH, sf_ranks),
        (has_quads, hv.CAT_QUADS, quad_ranks),
        (has_fh, hv.CAT_FULL_HOUSE, fh_ranks),
        (has_flush, hv.CAT_FLUSH, flush_ranks),
        (has_straight, hv.CAT_STRAIGHT, straight_ranks),
        (has_trips, hv.CAT_TRIPS, trips_ranks),
        (has_two_pair, hv.CAT_TWO_PAIR, two_pair_ranks),
        (has_pair, hv.CAT_PAIR, pair_ranks),
    ]
    cat = jnp.full_like(m0, hv.CAT_HIGH)
    ranks = high_ranks
    for cond, c, rs in reversed(table):
        cat = jnp.where(cond, c, cat)
        ranks = [jnp.where(cond, a, b) for a, b in zip(rs, ranks)]
    return _pack(cat, ranks)


def _keep_top(mask, n, max_clears):
    """Clear lowest set bits until at most ``n`` remain.

    ``max_clears`` bounds the unrolled loop (callers know the maximum
    popcount their category guarantees). For two masks with exactly ``n``
    bits set, numeric comparison of the results equals descending
    lexicographic comparison of the bit positions — the standard
    equal-cardinality set-compare isomorphism.
    """
    for _ in range(max_clears):
        mask = jnp.where(jax.lax.population_count(mask) > n,
                         mask & (mask - 1), mask)
    return mask


def eval_masks_cmp_impl(m0, m1, m2, m3):
    """Order-isomorphic fast hand key (comparison-only; NOT the packed
    reference format).

    Produces an int32 key whose ``<``/``==`` relations on any two 7-card
    hands are identical to those of ``eval_masks_impl``'s reference-packed
    keys (property-tested in ``tests/test_evaluator.py``), at ~60% of the
    op count: category payloads are kept as rank *bitmasks* (bits 2..14)
    instead of extracting five 4-bit ranks, exploiting that comparing
    equal-size rank sets as integers == comparing them lexicographically.
    Used inside the Pallas equity kernels, where keys are only compared.

    Layout: ``key = cat << 19 | payload`` with payloads:
        straight flush: top rank                      (4 bits)
        quads:          q << 4 | kicker               (8 bits)
        full house:     t << 4 | p                    (8 bits)
        flush:          top-5 bits of the flush suit  (15 bits)
        straight:       top rank                      (4 bits)
        trips:          t << 15 | top-2 kicker bits   (19 bits)
        two pair:       top-2 pair bits << 4 | kicker (19 bits)
        pair:           p << 15 | top-3 kicker bits   (19 bits)
        high:           top-5 bits of present         (15 bits)
    Max 23 bits: int32 order == uint32 order (Mosaic-safe).
    """
    present = m0 | m1 | m2 | m3

    c2p = (m0 & m1) | (m0 & m2) | (m0 & m3) | (m1 & m2) | (m1 & m3) | (m2 & m3)
    c3p = (m0 & m1 & m2) | (m0 & m1 & m3) | (m0 & m2 & m3) | (m1 & m2 & m3)
    c4 = m0 & m1 & m2 & m3
    trips = c3p & ~c4
    pairs = c2p & ~c3p

    straight_top = _run5_top(present)
    has_straight = straight_top >= 0

    fmask = jnp.zeros_like(m0)
    for m in (m0, m1, m2, m3):
        fmask = fmask | jnp.where(jax.lax.population_count(m) >= 5, m, 0)
    has_flush = fmask != 0
    sf_top = _run5_top(fmask)
    has_sf = sf_top >= 0

    has_quads = c4 != 0
    has_fh = (trips != 0) & ((pairs != 0) |
                             (jax.lax.population_count(trips) >= 2))
    has_trips = trips != 0
    has_two_pair = jax.lax.population_count(pairs) >= 2
    has_pair = pairs != 0

    q = jnp.maximum(_msb(c4), 0)
    qk = jnp.maximum(_msb(present & ~_bit(q)), 0)

    t_fh = jnp.maximum(_msb(trips), 0)
    p_fh = jnp.maximum(_msb((trips | pairs) & ~_bit(t_fh)), 0)

    # trips category: one trip + 4 singles -> present has 5 distinct ranks.
    trips_kick = _keep_top(present & ~_bit(t_fh), 2, 2)

    top2_pairs = _keep_top(pairs, 2, 1)  # at most 3 pair ranks in 7 cards
    tp_kick = jnp.maximum(_msb(present & ~top2_pairs), 0)

    p1 = jnp.maximum(_msb(pairs), 0)
    # pair category: one pair + 5 singles -> 5 ranks left after the pair.
    pair_kick = _keep_top(present & ~_bit(p1), 3, 2)

    table = [
        (has_sf, hv.CAT_STRAIGHT_FLUSH, jnp.maximum(sf_top, 0)),
        (has_quads, hv.CAT_QUADS, jnp.left_shift(q, 4) | qk),
        (has_fh, hv.CAT_FULL_HOUSE, jnp.left_shift(t_fh, 4) | p_fh),
        (has_flush, hv.CAT_FLUSH, _keep_top(fmask, 5, 2)),
        (has_straight, hv.CAT_STRAIGHT, jnp.maximum(straight_top, 0)),
        (has_trips, hv.CAT_TRIPS, jnp.left_shift(t_fh, 15) | trips_kick),
        (has_two_pair, hv.CAT_TWO_PAIR,
         jnp.left_shift(top2_pairs, 4) | tp_kick),
        (has_pair, hv.CAT_PAIR, jnp.left_shift(p1, 15) | pair_kick),
    ]
    key = _keep_top(present, 5, 2)  # high card
    for cond, c, payload in reversed(table):
        key = jnp.where(cond, jnp.left_shift(I32(c), 19) | payload, key)
    return key


eval_masks = jax.jit(eval_masks_impl)
eval_masks_cmp = jax.jit(eval_masks_cmp_impl)


@jax.jit
def eval7_from_cards(cards):
    """[..., K] distinct card ids -> packed uint32 hand keys."""
    return eval_masks_impl(*suit_masks_from_cards(cards))
