"""The pure table step: actions, street transitions, showdown settlement.

This is the array-program replacement for the reference's actor hot path
(``board.clj:31-97`` ActionP impl + ``board-action`` ``:122-129`` +
``gameplay.clj`` street/showdown logic). One action = one call of
``step_action``; a full hand is a bounded ``lax.scan`` of it. Everything is
branch-free (``jnp.where`` selects between candidate states), so the same
code drives a single interactive table from the host and millions of
vmapped self-play tables on device.

Bit-exactly preserved reference semantics (each with a citation):

- Action encoding: negative = fold, 0 = call/check, positive = raise-by-amt
  (``action.clj:12-29``).
- Fold removes the seat from every bet layer's members and from the
  play-order *by filtering* (head does not advance) (``board.clj:33-44``).
- Call threads the full standing total through the layers; paying exactly
  the remaining stack is an all-in that also removes the seat from
  ``:players`` — excluding it from showdown evaluation (``board.clj:45-71``).
- Raise threads ``r + total``; all-in on exact equality; remaining-players
  resets to everyone-in-hand-but-the-raiser (``board.clj:72-97``).
- Street ends when remaining-players empties; hand ends when <=1 player
  remains in ``:players`` or the river street completes
  (``gameplay.clj:15-24``).
- Pot resolution: per pot layer, winners are the highest-valued *in-hand*
  players among the layer's members; each gets ``(bet * n) // |winners|``
  — integer division, remainder chips vanish (``gameplay.clj:104-116``).

Documented divergences (reference behavior is a crash, not a semantic):

- A pot layer whose members are all folded/all-in pays nobody (the reference
  divides by zero, ``gameplay.clj:112``).
- Showdowns with zero in-hand players (everyone all-in) pay nobody (the
  reference crashes evaluating an empty winner list).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from montecarlo_tpu.engine.bets import Layers, member_matrix
from montecarlo_tpu.engine.street import (
    bets_as_layers,
    bets_empty_like,
    bets_fold_check_merge,
    bets_needed,
    bets_thread,
    bets_total,
)
from montecarlo_tpu.engine.state import TableState, next_hand
from montecarlo_tpu.ops.evaluator import eval7_from_cards

I32 = jnp.int32


def head_info(state: TableState) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(head position, cursor-after-rest, head exists).

    The head is the first hand-order position still in the play-order cycle,
    scanning from ``cursor`` (the array form of taking the first element of
    the reference's filtered lazy cycle, ``board.clj:34``). Pure arithmetic
    min-reduction — no dynamic gather (state is positional; the button maps
    positions to seats only at the host boundary).
    """
    P = state.num_seats
    pos = jnp.arange(P)
    prio = (pos - state.cursor) % P
    masked = jnp.where(state.order_mask, prio, P)
    k = jnp.min(masked)
    exists = k < P
    head = (state.cursor + k) % P
    cursor_after = (state.cursor + k + 1) % P
    return head, cursor_after, exists


def _pick(x, i):
    """x[i] for traced scalar i without a gather."""
    return jnp.sum(jnp.where(jnp.arange(x.shape[0]) == i, x, 0))


@jax.jit
def clamp_action(state: TableState, action) -> jax.Array:
    """Player-side validation layer (``player.clj:24-32``): raises are
    clamped to ``[0, stack - needed]`` — an unaffordable raise becomes a
    call. Fold/call pass through."""
    seat, _, _ = head_info(state)
    cap = _pick(state.stacks, seat) - bets_needed(state.bets, seat)
    clamped = jnp.maximum(0, jnp.minimum(action, cap))
    return jnp.where(action > 0, clamped, action)


def _select_tree(pred, a, b):
    return jax.tree.map(lambda xa, xb: jnp.where(pred, xa, xb), a, b)


@partial(jax.jit, static_argnames=("rules",))
def apply_action(state: TableState, action, rules: str = "reference"
                 ) -> TableState:
    """Apply one fold/call/raise by the current head (``board.clj:31-97``).

    Unconditional — callers gate on ``hand_over``/head existence.

    ``rules="reference"`` is bit-exact to the Clojure code (quirks
    included); ``rules="standard"`` is real poker accounting (see
    ``TableConfig.rules``).
    """
    P = state.num_seats
    seat, cursor_after, _ = head_info(state)
    onehot = jnp.arange(P) == seat

    is_fold = action < 0
    is_raise = action > 0
    is_call = action == 0
    r = jnp.maximum(action, 0).astype(I32)

    bets = state.bets
    bet_amt = bets_total(bets)
    delta = bets_needed(bets, seat)
    stack = _pick(state.stacks, seat)

    is_check = is_call & (bet_amt == 0)
    threads = (is_call & (bet_amt > 0)) | is_raise

    if rules != "reference":
        # Payments cap at the stack: an all-in for less joins only what it
        # can cover, splitting a side pot inside update_bets.
        pay_call = jnp.minimum(delta, stack)
        pay_raise = jnp.minimum(delta + r, stack)
        amount = jnp.where(is_raise,
                           r + bet_amt - (delta + r - pay_raise),
                           bet_amt - (delta - pay_call))
        paid = jnp.where(threads, jnp.where(is_raise, pay_raise, pay_call), 0)
    else:
        # Reference: call pays the full delta (stacks may go negative,
        # gameplay.clj:83-88 has no floor); raise threads r + total.
        amount = jnp.where(is_raise, r + bet_amt, bet_amt)
        paid = jnp.where(threads, jnp.where(is_raise, delta + r, delta), 0)

    threaded = bets_thread(bets, amount, seat)
    # Fold and check both end in merge-bets (fold after member removal,
    # board.clj:37-41 / :67-71): select the input first, merge once.
    merged = bets_fold_check_merge(bets, is_fold, seat)
    new_bets = _select_tree(is_fold | is_check, merged, threaded)

    went_all_in = threads & (paid == stack)
    if rules != "reference":
        # All-in seats stop acting but stay live for the showdown.
        in_hand = state.in_hand & ~(onehot & is_fold)
        all_in = state.all_in | (onehot & went_all_in)
        actable = in_hand & ~all_in
        to_act = jnp.where(is_raise, actable & ~onehot,
                           state.to_act & ~onehot)
        order_mask = state.order_mask & ~(onehot & (is_fold | went_all_in))
    else:
        # Reference quirk: exact-equality all-ins leave :players entirely —
        # excluded from showdown evaluation (board.clj:53-60, 80-89).
        in_hand = state.in_hand & ~(onehot & (is_fold | went_all_in))
        all_in = state.all_in
        to_act = jnp.where(is_raise, in_hand & ~onehot,
                           state.to_act & ~onehot)
        order_mask = state.order_mask & ~(onehot & is_fold)

    return state._replace(
        time=state.time + 1,
        bets=new_bets,
        stacks=state.stacks - jnp.where(onehot, paid, 0),
        in_hand=in_hand,
        all_in=all_in,
        folded=state.folded | (onehot & is_fold),
        order_mask=order_mask,
        to_act=to_act,
        cursor=jnp.where(is_fold, state.cursor, cursor_after),
        street_raises=state.street_raises + is_raise.astype(I32),
        last_raiser=jnp.where(is_raise, seat, state.last_raiser),
    )


def stage_end(state: TableState) -> jax.Array:
    """remaining-players empty (``gameplay.clj:15-17``)."""
    return ~jnp.any(state.to_act)


def game_end(state: TableState) -> jax.Array:
    """<=1 in-hand player, or river street complete (``gameplay.clj:19-24``)."""
    return (jnp.sum(state.in_hand) <= 1) | (stage_end(state) & (state.stage == 3))


def append_layers(dst: Layers, src: Layers) -> Layers:
    """``(concat pots bets)`` on fixed-shape layer arrays.

    Gather-free: the shifted copy goes through a [PL, L] placement matrix
    (tiny boolean einsum) instead of a dynamic gather; all four per-layer
    fields are scalar columns (members are seat bitmasks).
    """
    PL, L = dst.capacity, src.capacity
    idx = jnp.arange(PL)
    src_idx = jnp.arange(L)
    # place[j, s]: output row j receives source row s.
    place = (idx[:, None] == src_idx[None, :] + dst.count) \
        & (src_idx[None, :] < src.count)
    take = jnp.any(place, axis=1)

    def placed(col):
        return jnp.sum(jnp.where(place, col[None, :], 0), axis=1)

    return Layers(
        amt=jnp.where(take, placed(src.amt), dst.amt),
        mem=jnp.where(take, placed(src.mem), dst.mem),
        orig=jnp.where(take, placed(src.orig), dst.orig),
        n=jnp.where(take, placed(src.n), dst.n),
        count=jnp.minimum(dst.count + src.count, PL),
        overflow=dst.overflow | src.overflow
        | (dst.count + src.count > PL),
    )


def stage_transition(state: TableState, rules: str = "reference") -> TableState:
    """Deal the next street and reset the betting round
    (``gameplay.clj:94-102``): flop 3 / turn 1 / river 1 revealed, bets move
    onto the pots, remaining-players and play-order rebuild from ``:players``
    (all-in seats drop out of the order here)."""
    reveal = jnp.where(state.stage == 0, 3, 1)
    actable = state.in_hand & ~state.all_in if rules != "reference" \
        else state.in_hand
    return state._replace(
        n_community=state.n_community + reveal,
        to_act=actable,
        pots=append_layers(state.pots,
                           bets_as_layers(state.bets, state.folded)),
        bets=bets_empty_like(state.bets, state.num_seats),
        order_mask=actable,
        cursor=jnp.zeros((), I32),
        stage=state.stage + 1,
        street_raises=jnp.zeros((), I32),
        last_raiser=jnp.full((), state.num_seats, I32),
    )


def hand_values(state: TableState) -> jax.Array:
    """Packed 7-card values per seat (hole + full community)."""
    P = state.num_seats
    cards = jnp.concatenate(
        [state.hole, jnp.broadcast_to(state.community, (P, 5))], axis=1)
    return eval7_from_cards(cards)


def hand_values_cmp(state: TableState) -> jax.Array:
    """Comparison-only 7-card keys per seat (order/tie-isomorphic to the
    packed reference keys — property-tested in tests/test_evaluator.py).
    The showdown only compares values within one hand, so the cheaper key
    yields bit-identical winner sets and payouts."""
    from montecarlo_tpu.ops.evaluator import (
        eval_masks_cmp_impl,
        suit_masks_from_cards,
    )

    P = state.num_seats
    cards = jnp.concatenate(
        [state.hole, jnp.broadcast_to(state.community, (P, 5))], axis=1)
    return eval_masks_cmp_impl(*suit_masks_from_cards(cards))


@partial(jax.jit, static_argnames=("rules",))
def settle_showdown(state: TableState, rules: str = "reference") -> TableState:
    """End-of-hand pot resolution (``gameplay.clj:122-133``): flush street
    bets into the pots and pay each pot layer to its best eligible members.

    Reference rules: eligibility = current members ∩ :players (all-in seats
    were removed from both), payout ``amt * n`` with the inflated ``n``,
    integer split, remainders vanish. Standard rules: eligibility =
    contributors ∩ not-folded (all-in seats live), payout
    ``amt * |contributors|`` (exactly the chips put in), odd chips to the
    first-position winner — chips conserve exactly.
    """
    pots = append_layers(state.pots,
                         bets_as_layers(state.bets, state.folded))
    values = hand_values_cmp(state).astype(jnp.uint32)

    PL = pots.capacity
    P = state.num_seats
    valid = (jnp.arange(PL) < pots.count)[:, None]
    if rules != "reference":
        live = state.in_hand  # not folded (all-in included)
        orig_m = member_matrix(pots.orig, P)
        elig = orig_m & live[None, :] & valid
        total_pot = pots.amt * jnp.where(
            valid[:, 0], jax.lax.population_count(pots.orig), 0)
    else:
        elig = member_matrix(pots.mem, P) & state.in_hand[None, :] & valid
        total_pot = pots.amt * pots.n
    vmax = jnp.max(jnp.where(elig, values[None, :], 0), axis=1)
    winners = elig & (values[None, :] == vmax[:, None])
    cnt = jnp.sum(winners, axis=1)
    share = jnp.where(cnt > 0, total_pot // jnp.maximum(cnt, 1), 0)
    payout = jnp.sum(jnp.where(winners, share[:, None], 0), axis=0)
    if rules != "reference":
        # Odd chips to the first-position winner of each layer.
        rem = jnp.where(cnt > 0, total_pot % jnp.maximum(cnt, 1), 0)
        first = jnp.argmax(winners, axis=1)  # [PL]
        P = state.num_seats
        first_onehot = (jnp.arange(P)[None, :] == first[:, None]) & (cnt > 0)[:, None]
        payout = payout + jnp.sum(
            jnp.where(first_onehot, rem[:, None], 0), axis=0)

    return state._replace(
        stacks=state.stacks + payout,
        pots=pots,
        bets=bets_empty_like(state.bets, state.num_seats),
        hand_over=jnp.ones((), jnp.bool_),
    )


def _advance_streets(state: TableState, rules: str) -> TableState:
    """Street transitions after an action. Reference: at most one
    (board-action, board.clj:122-129). Standard: closed betting runs the
    board out — when every live seat is all-in, streets chain to the river
    in the same step (up to 4 masked transitions)."""
    n = 4 if rules != "reference" else 1
    for _ in range(n):
        cond = stage_end(state) & ~game_end(state)
        state = _select_tree(cond, stage_transition(state, rules), state)
    return state


@partial(jax.jit, static_argnames=("rules",))
def step_action(state: TableState, action, rules: str = "reference"
                ) -> TableState:
    """One action plus street bookkeeping, *without* paying the showdown
    (single-hand rollout form — settle once after the scan with
    ``settle_showdown``). No-op when the hand is already over.

    Mirrors ``board-action`` (``board.clj:122-129``): act, then either latch
    game end or transition the street(s).
    """
    _, _, exists = head_info(state)
    acted = apply_action(state, action, rules=rules)
    advanced = _advance_streets(acted, rules)
    out = advanced._replace(hand_over=advanced.hand_over | game_end(advanced))
    return _select_tree(state.hand_over | ~exists, state, out)


@partial(jax.jit, static_argnames=("rules",))
def step_table(state: TableState, action, rules: str = "reference"
               ) -> TableState:
    """Full continuous-table step (the server / perpetual-game form,
    ``gameplay.clj:122-150``): on game end, settle the showdown and
    immediately deal the next hand — busted players and all.

    A state with ``hand_over`` already latched is returned unchanged: under
    tournament rules ``next_hand`` freezes a finished table (one player
    holding all chips) in that form, terminating the perpetual loop."""
    _, _, exists = head_info(state)
    acted = apply_action(state, action, rules=rules)
    advanced = _advance_streets(acted, rules)
    ended = game_end(advanced)
    settled = next_hand(settle_showdown(advanced, rules=rules)._replace(
        hand_over=jnp.zeros((), jnp.bool_)), rules=rules)
    out = _select_tree(ended, settled, advanced)
    return _select_tree(state.hand_over | ~exists, state, out)
