"""Levels-based street bet state: the O(1)-column form of the layer algebra.

The reference's street state is an ordered list of ``Bet`` layers mutated by
``update-bets``/``merge-bets`` (``bet.clj``); ``engine.bets`` transcribes
that literally as four parallel columns (amt/mem/orig/n). This module stores
the *minimal* street state instead and derives the full layer list only at
observation points (street end, settlement, host projection):

- ``level``  i32[L]: ascending cumulative boundaries. Layer ``j`` is the
  chip range ``(level[j-1], level[j]]``; its reference ``:bet`` amount is
  the difference of adjacent levels.
- ``n``      i32[L]: the reference contribution counter per layer.
- ``contrib`` i32[P]: chips each seat has put into this street so far.

Everything else in a reference layer is a pure function of this state plus
the fold mask (invariants provable by induction over ``bet.clj``'s ops):

- ``orig`` (original-players) of layer ``j`` = ``{s : contrib[s] >= level[j]}``
  — original membership grows exactly when a seat's threaded total covers
  the layer (``bet.clj:37-43,45-59``), and street contributions never
  decrease.
- ``mem`` (players) = ``orig`` minus folded seats — folding removes the seat
  from every layer's members and nothing else (``board.clj:37-41``), and
  member sets are only *observed* at street end / settlement / projection.
- ``n`` of layer ``j`` = number of ``update-bets`` events whose amount
  covered ``level[j]``, EXCEPT across ``merge-bets`` (which keeps the later
  layer's ``n``, ``bet.clj:20-23``) — so ``n`` is carried explicitly and
  updated incrementally rather than derived.

The per-action ops then shrink from four-column array programs to:

- ``street_update`` (== ``update-bets``): bump one seat's ``contrib``,
  +1 the ``n`` of covered levels, and insert the amount into the sorted
  ``level`` column if new — split, call, and append all collapse into one
  sorted-insert because boundaries are all a split *is* here.
- ``street_merge`` (== ``merge-bets`` after folds/checks): adjacent layers
  have identical member AND original sets iff no seat's contribution sits
  exactly on the boundary between them (sets differ exactly at seats whose
  contribution equals the lower boundary), so merging == deleting levels
  that no current contribution matches. One [L, P] compare + a two-column
  compaction.

Restriction: levels are strictly positive, so a zero-chip post must not
create a layer. The reference server validates blinds as positive ints
(``server.clj:24-31``), making a zero layer unreachable over the wire; the
literal layer engine (``engine.bets``) remains the default and covers that
corner bit-exactly.

The ``bets_*`` adapters at the bottom dispatch on the street-state type at
trace time (zero runtime cost), so one engine serves both implementations
and the conformance suite pins their trajectory equality.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from montecarlo_tpu.engine.bets import (
    Layers,
    empty_layers,
    merge_bets,
    needed_bet,
    remove_player,
    total_bet,
    update_bets,
)

I32 = jnp.int32


class Street(NamedTuple):
    """Minimal street bet state (see module docstring)."""

    level: jax.Array    # i32[L] ascending cumulative boundaries (0 padded)
    n: jax.Array        # i32[L] reference :n per layer
    contrib: jax.Array  # i32[P] per-seat chips in this street
    count: jax.Array    # i32[] live levels
    overflow: jax.Array  # bool[] capacity exceeded at some point

    @property
    def capacity(self) -> int:
        return self.level.shape[0]


def empty_street(max_layers: int, num_seats: int) -> Street:
    return Street(
        level=jnp.zeros((max_layers,), I32),
        n=jnp.zeros((max_layers,), I32),
        contrib=jnp.zeros((num_seats,), I32),
        count=jnp.zeros((), I32),
        overflow=jnp.zeros((), jnp.bool_),
    )


def _pick(x, i):
    """x[i] for traced scalar i without a gather (one-hot reduce)."""
    return jnp.sum(jnp.where(jnp.arange(x.shape[0]) == i, x, 0))


@jax.jit
def street_total(s: Street) -> jax.Array:
    """Total standing street bet == the top boundary (``helpers.clj:15-19``:
    layer amounts are boundary differences, so they telescope)."""
    valid = jnp.arange(s.capacity) < s.count
    return jnp.max(jnp.where(valid, s.level, 0))


@jax.jit
def street_needed(s: Street, seat) -> jax.Array:
    """``helpers.clj:21-27``: the sum of layers the seat is not a member of
    == total - own contribution (a seat's contribution always sits exactly
    on a boundary, so the covered prefix telescopes to ``contrib``).

    Valid for NON-FOLDED seats only: folding strips the seat from member
    sets, so the reference would charge a folded seat every layer again.
    Every engine query site asks about the acting head seat, which is in
    the play-order and therefore never folded (``board.clj:34``,
    ``player.clj:36-38``); pinned by tests/test_street.py."""
    return street_total(s) - _pick(s.contrib, seat)


@jax.jit
def street_update(s: Street, amount, seat) -> Street:
    """``update-bets`` (``bet.clj:45-59``): seat's street total becomes
    ``amount``; every covered layer's ``n`` increments (the reference's
    n-inflation counts re-joins too); a new boundary is sorted-inserted when
    ``amount`` is not already a level (split/append unified). ``amount <= 0``
    is a no-op (see module docstring)."""
    L = s.capacity
    idx = jnp.arange(L)
    valid = idx < s.count
    amount = jnp.asarray(amount, I32)

    n_inc = s.n + (valid & (s.level <= amount)).astype(I32)
    exists = jnp.any(valid & (s.level == amount))
    pos = jnp.sum((valid & (s.level < amount)).astype(I32))
    # Split: the new lower part takes the containing layer's (pre-increment)
    # n plus the splitter's own join; append starts a fresh n=1 layer.
    new_n = jnp.where(pos == s.count, 1, _pick(s.n, pos) + 1)

    def insert(col, newval):
        rolled = jnp.roll(col, 1)
        return jnp.where(idx < pos, col,
                         jnp.where(idx == pos, newval, rolled))

    ins_count = jnp.minimum(s.count + 1, L)
    do_insert = (~exists) & (amount > 0)
    level = jnp.where(do_insert, insert(s.level, amount), s.level)
    n = jnp.where(amount > 0, jnp.where(do_insert, insert(n_inc, new_n),
                                        n_inc), s.n)
    count = jnp.where(do_insert, ins_count, s.count)
    live = idx < count
    onehot = jnp.arange(s.contrib.shape[0]) == seat
    return Street(
        level=jnp.where(live, level, 0),
        n=jnp.where(live, n, 0),
        contrib=jnp.where(onehot & (amount > 0),
                          jnp.maximum(s.contrib, amount), s.contrib),
        count=count,
        overflow=s.overflow | (do_insert & (s.count >= L)),
    )


@jax.jit
def street_merge(s: Street) -> Street:
    """``merge-bets`` (``bet.clj:10-27``): adjacent layers coalesce iff no
    seat's contribution sits on the boundary between them, so merging ==
    compacting away unmatched levels. The kept (upper) row carries its own
    ``n`` — exactly the reference's later-layer-wins rule."""
    L = s.capacity
    idx = jnp.arange(L)
    valid = idx < s.count
    matched = jnp.any(s.contrib[None, :] == s.level[:, None], axis=1)
    keep = valid & matched & (s.level > 0)
    rank = jnp.cumsum(keep.astype(I32)) - 1
    sel = (rank[None, :] == idx[:, None]) & keep[None, :]  # [out, in]
    return s._replace(
        level=jnp.sum(jnp.where(sel, s.level[None, :], 0), axis=1),
        n=jnp.sum(jnp.where(sel, s.n[None, :], 0), axis=1),
        count=jnp.sum(keep.astype(I32)),
    )


@jax.jit
def street_to_layers(s: Street, folded) -> Layers:
    """Materialize the reference layer list (``Bet{bet players
    original-players n}``) for street end / settlement / projection."""
    L = s.capacity
    P = s.contrib.shape[0]
    idx = jnp.arange(L)
    valid = idx < s.count
    lvl = jnp.where(valid, s.level, 0)
    prev = jnp.where(idx == 0, 0, jnp.roll(lvl, 1))
    ge = (s.contrib[None, :] >= lvl[:, None]) & valid[:, None]  # [L, P]
    bits = jnp.left_shift(I32(1), jnp.arange(P))[None, :]
    return Layers(
        amt=jnp.where(valid, lvl - prev, 0),
        mem=jnp.sum(jnp.where(ge & ~folded[None, :], bits, 0), axis=1),
        orig=jnp.sum(jnp.where(ge, bits, 0), axis=1),
        n=jnp.where(valid, s.n, 0),
        count=s.count,
        overflow=s.overflow,
    )


# ---------------------------------------------------------------------------
# Trace-time dispatch adapters: one engine, two street implementations.
# ---------------------------------------------------------------------------

def bets_total(bets) -> jax.Array:
    if isinstance(bets, Street):
        return street_total(bets)
    return total_bet(bets)


def bets_needed(bets, seat) -> jax.Array:
    if isinstance(bets, Street):
        return street_needed(bets, seat)
    return needed_bet(bets, seat)


def bets_thread(bets, amount, seat):
    if isinstance(bets, Street):
        return street_update(bets, amount, seat)
    return update_bets(bets, amount, seat)


def bets_fold_check_merge(bets, is_fold, seat):
    """The fold/check path (``board.clj:37-41`` / ``:67-71``): fold removes
    the seat from member sets then merges; check merges only. In the levels
    form member sets are derived (fold is tracked by the state's fold mask),
    so both collapse to one merge filter."""
    if isinstance(bets, Street):
        del is_fold, seat
        return street_merge(bets)
    from montecarlo_tpu.engine.step import _select_tree
    return merge_bets(_select_tree(is_fold, remove_player(bets, seat), bets))


def bets_empty_like(bets, num_seats: int):
    if isinstance(bets, Street):
        return empty_street(bets.capacity, num_seats)
    return empty_layers(bets.capacity, num_seats)


def bets_as_layers(bets, folded) -> Layers:
    """A reference layer-list view of the street (identity for ``Layers``)."""
    if isinstance(bets, Street):
        return street_to_layers(bets, folded)
    return bets


def make_empty_bets(impl: str, max_layers: int, num_seats: int):
    if impl == "levels":
        return empty_street(max_layers, num_seats)
    assert impl == "layers", impl
    return empty_layers(max_layers, num_seats)
