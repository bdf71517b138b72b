"""Layered-bet algebra on fixed-shape arrays.

The reference models a betting street as an ordered list of *layers*
(``bet.clj``): ``Bet{bet players original-players n}`` means "``bet`` chips
matched by each member of ``players``"; side pots fall out of splitting
layers. The list is variable-length and mutated by ordered splits/inserts
(``update-bets`` ``bet.clj:45-59``) and adjacency-sensitive coalescing
(``merge-bets`` ``bet.clj:10-27``).

Here a street is a fixed-size layer array with player sets packed as int32
**seat bitmasks** (one scalar per layer, like the native C++ engine), so
set union/removal/equality are single integer ops and both algebra
operations are O(L) scalar-array programs — no data-dependent shapes, no
[L, P] matrices on the hot path. The whole thing vmaps over a tables axis
and compiles into one XLA program; per-seat boolean views are expanded only
at showdown settlement and in host projections.

Bit-exactly preserved reference quirks:

- ``update-bets`` threads the *full* standing total through every layer, so
  a caller is "added" to layers it already belongs to: the membership set is
  unchanged but ``n`` (the contribution counter used for payouts,
  ``gameplay.clj:112``) is incremented anyway. This inflates ``n`` beyond the
  true contributor count — and therefore the payout ``bet * n`` — exactly as
  the reference does.
- ``merge-bets`` keeps the **later** layer's ``n`` when coalescing
  (``bet.clj:20-23`` constructs the merged layer from ``bet-i``).
- Folding removes the player from every layer's ``players`` but never from
  ``original-players`` (``board.clj:37-41``), then re-coalesces.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

I32 = jnp.int32

MAX_SEATS = 23  # bitmask seats must fit an int32 without the sign bit


class Layers(NamedTuple):
    """A fixed-capacity ordered list of bet layers (one street or the pots).

    ``amt``/``n`` are i32[L]; ``mem``/``orig`` are i32[L] **seat bitmasks**
    (bit s = seat s belongs); ``count`` is the number of live layers;
    ``overflow`` latches if capacity was ever exceeded (a dropped layer —
    raise L).
    """

    amt: jax.Array   # i32[L] chips per member in this layer
    mem: jax.Array   # i32[L] current member bitmask (:players)
    orig: jax.Array  # i32[L] original member bitmask (never shrunk by folds)
    n: jax.Array     # i32[L] contribution counter (reference :n)
    count: jax.Array  # i32[] number of live layers
    overflow: jax.Array  # bool[] capacity exceeded at some point

    @property
    def capacity(self) -> int:
        return self.amt.shape[0]


def empty_layers(max_layers: int, num_seats: int) -> Layers:
    assert num_seats <= MAX_SEATS
    return Layers(
        amt=jnp.zeros((max_layers,), I32),
        mem=jnp.zeros((max_layers,), I32),
        orig=jnp.zeros((max_layers,), I32),
        n=jnp.zeros((max_layers,), I32),
        count=jnp.zeros((), I32),
        overflow=jnp.zeros((), jnp.bool_),
    )


def member_matrix(masks, num_seats: int) -> jax.Array:
    """i32[L] bitmasks -> bool[L, P] membership matrix (settle/projection)."""
    return ((masks[:, None] >> jnp.arange(num_seats)[None, :]) & 1) != 0


def _seat_bit(seat) -> jax.Array:
    return jnp.left_shift(I32(1), seat)


def _valid(layers: Layers) -> jax.Array:
    return jnp.arange(layers.capacity) < layers.count


@jax.jit
def total_bet(layers: Layers) -> jax.Array:
    """Sum of all standing layer amounts (``helpers.clj:15-19``)."""
    return jnp.sum(jnp.where(_valid(layers), layers.amt, 0))


@jax.jit
def needed_bet(layers: Layers, seat) -> jax.Array:
    """Sum of layers the seat is not yet a member of (``helpers.clj:21-27``)."""
    unmet = _valid(layers) & ((layers.mem & _seat_bit(seat)) == 0)
    return jnp.sum(jnp.where(unmet, layers.amt, 0))


def _pick(x, i):
    """x[i] for a traced scalar i, without a gather (one-hot reduce)."""
    return jnp.sum(jnp.where(jnp.arange(x.shape[0]) == i, x, 0))


def _added(layers: Layers, seat, row_mask) -> Layers:
    """Add `seat` to membership of rows in row_mask (call-bet semantics:
    players/orig conj + n increment — increments n even when already a
    member, the reference's n-inflation quirk)."""
    grow = jnp.where(row_mask, _seat_bit(seat), 0)
    return layers._replace(
        mem=layers.mem | grow,
        orig=layers.orig | grow,
        n=layers.n + row_mask.astype(I32),
    )


@jax.jit
def update_bets(layers: Layers, bet_amt, seat) -> Layers:
    """Thread a single-seat bet of ``bet_amt`` through the standing layers.

    Exact array transcription of ``bet.clj:45-59``: walk layers in order,
    joining each layer the bet covers; split the first layer it only partially
    covers (side-pot creation); append a fresh layer for any excess.
    """
    L = layers.capacity
    idx = jnp.arange(L)
    valid = _valid(layers)
    amt_v = jnp.where(valid, layers.amt, 0)
    prefix = jnp.cumsum(amt_v)
    total = prefix[-1] if L > 0 else jnp.zeros((), I32)

    stop = valid & (bet_amt <= prefix)
    has_stop = jnp.any(stop)
    i_star = jnp.argmax(stop)  # first True (0 when none; gated by has_stop)
    prefix_at = _pick(prefix, i_star)
    amt_at = _pick(layers.amt, i_star)
    is_eq = has_stop & (bet_amt == prefix_at)
    is_split = has_stop & ~is_eq

    # Case: bet exactly consumes layers 0..i* -> join all of them.
    eq_out = _added(layers, seat, valid & (idx <= i_star))

    # Case: bet partially covers layer i* -> join 0..i*-1, split i* into
    # (x, members+seat) / (rest, members), shift the tail right by one.
    # The shifted read (row j reads j-1 past the split point) is a constant
    # roll-by-one selected by position — no dynamic gather.
    x = bet_amt - (prefix_at - amt_at)
    keep = idx <= i_star

    def shifted(a):
        return jnp.where(keep, a, jnp.roll(a, 1, axis=0))

    sp_amt = jnp.where(idx == i_star, x,
                       jnp.where(idx == i_star + 1, amt_at - x,
                                 shifted(layers.amt)))
    sp = layers._replace(amt=sp_amt, mem=shifted(layers.mem),
                         orig=shifted(layers.orig), n=shifted(layers.n))
    sp = _added(sp, seat, idx <= i_star)
    sp = sp._replace(
        count=jnp.minimum(layers.count + 1, L),
        overflow=layers.overflow | (layers.count >= L),
    )

    # Case: bet exceeds all standing layers -> join everything, append the
    # excess as a fresh single-seat layer.
    ap = _added(layers, seat, valid)
    at_end = idx == layers.count
    bit_at_end = jnp.where(at_end, _seat_bit(seat), 0)
    ap = ap._replace(
        amt=jnp.where(at_end, bet_amt - total, ap.amt),
        mem=ap.mem | bit_at_end,
        orig=ap.orig | bit_at_end,
        n=jnp.where(at_end, 1, ap.n),
        count=jnp.minimum(layers.count + 1, L),
        overflow=layers.overflow | (layers.count >= L),
    )

    def sel(a, b, c):
        # is_eq -> a, is_split -> b, else -> c  (elementwise over the pytree)
        return jax.tree.map(
            lambda xa, xb, xc: jnp.where(is_eq, xa, jnp.where(is_split, xb, xc)),
            a, b, c)

    return sel(eq_out, sp, ap)


@jax.jit
def merge_bets(layers: Layers) -> Layers:
    """Coalesce adjacent layers with identical member & original-member sets
    (``bet.clj:10-27``): amounts sum, the **later** layer's ``n`` wins."""
    L = layers.capacity
    idx = jnp.arange(L)
    valid = _valid(layers)

    same_mem = layers.mem == jnp.roll(layers.mem, 1)
    same_orig = layers.orig == jnp.roll(layers.orig, 1)
    same_prev = valid & jnp.roll(valid, 1) & same_mem & same_orig & (idx > 0)
    new_group = valid & ~same_prev
    gid = jnp.cumsum(new_group.astype(I32)) - 1  # group id per valid layer
    n_groups = jnp.sum(new_group.astype(I32))

    sel = (gid[None, :] == idx[:, None]) & valid[None, :]  # [group, layer]
    out_amt = jnp.sum(jnp.where(sel, layers.amt[None, :], 0), axis=1)
    # Each group contributes exactly one "last" row; sets are equal within a
    # group and the merged n is the LAST member's (bet.clj:20-23).
    is_last = valid & ~jnp.concatenate(
        [same_prev[1:], jnp.zeros((1,), jnp.bool_)])
    pick_last = sel & is_last[None, :]
    out_mem = jnp.sum(jnp.where(pick_last, layers.mem[None, :], 0), axis=1)
    out_orig = jnp.sum(jnp.where(pick_last, layers.orig[None, :], 0), axis=1)
    out_n = jnp.sum(jnp.where(pick_last, layers.n[None, :], 0), axis=1)
    out_valid = idx < n_groups
    return layers._replace(
        amt=jnp.where(out_valid, out_amt, 0),
        mem=jnp.where(out_valid, out_mem, 0),
        orig=jnp.where(out_valid, out_orig, 0),
        n=jnp.where(out_valid, out_n, 0),
        count=n_groups,
    )


@jax.jit
def remove_player(layers: Layers, seat) -> Layers:
    """Fold semantics (``board.clj:37-41``): drop the seat from every layer's
    members (never from original-players); callers then ``merge_bets``."""
    return layers._replace(mem=layers.mem & ~_seat_bit(seat))
