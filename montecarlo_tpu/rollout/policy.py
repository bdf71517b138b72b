"""Random betting policy for self-play rollouts.

The reference has no built-in agents (clients act over TCP); this is the
batched random-policy agent demanded by BASELINE config 4. Actions use the
reference encoding (negative fold / 0 call / positive raise-by-amt,
``action.clj:12-29``) and are fed through the same validation clamp as the
reference player layer (``player.clj:24-32``).

Termination: a raise re-opens betting (``board.clj:87-97``), so unbounded
random raising could stall a street. The policy takes the street's raise
count and stops raising after ``max_raises_per_street``, bounding a street
at ``P * (1 + max_raises)`` actions — the scan bound used by selfplay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from montecarlo_tpu.engine.street import bets_needed
from montecarlo_tpu.engine.state import TableState
from montecarlo_tpu.engine.step import head_info

I32 = jnp.int32


def random_policy(
    key: jax.Array,
    state: TableState,
    street_raises: jax.Array,
    *,
    fold_prob: float = 0.15,
    raise_prob: float = 0.30,
    max_raise: int = 20,
    max_raises_per_street: int = 2,
) -> jax.Array:
    """One random action for the current head seat.

    Folding when nothing is owed is converted to a check (a fold with
    needed-bet 0 is legal in the reference but pointless; keeping hands
    alive gives showdown-heavy traffic, the expensive path worth benching).
    """
    k_move, k_amt = jax.random.split(key)
    u = jax.random.uniform(k_move)
    amt = jax.random.randint(k_amt, (), 1, max_raise + 1, dtype=I32)

    seat, _, _ = head_info(state)
    owes = bets_needed(state.bets, seat) > 0
    can_raise = street_raises < max_raises_per_street

    action = jnp.where(
        u < fold_prob,
        jnp.where(owes, I32(-1), I32(0)),
        jnp.where((u < fold_prob + raise_prob) & can_raise, amt, I32(0)),
    )
    return action


def seat_policies(policies):
    """Combine per-position policies into one table policy (agent-vs-agent
    evaluation: position j acts with ``policies[j]``).

    Every branch is evaluated under vmap (they're cheap); the head
    position's action is selected. Positions are hand-order (position 0 is
    this hand's small blind); fix seat identities across hands by rotating
    the list with the button at the host level if needed.
    """

    def policy(key, state, street_raises):
        seat, _, _ = head_info(state)
        actions = jnp.stack([
            jnp.asarray(p(jax.random.fold_in(key, j), state, street_raises),
                        I32)
            for j, p in enumerate(policies)])
        return jnp.sum(jnp.where(jnp.arange(len(policies)) == seat,
                                 actions, 0))

    return policy


def always_call(key, state, street_raises):
    """The calling station (useful as an evaluation baseline)."""
    del key, state, street_raises
    return I32(0)


def tight_policy(key, state, street_raises, fold_prob: float = 0.5):
    """Folds half the time it owes chips, otherwise calls."""
    seat, _, _ = head_info(state)
    owes = bets_needed(state.bets, seat) > 0
    u = jax.random.uniform(key)
    return jnp.where(owes & (u < fold_prob), I32(-1), I32(0))


def pinned_seat_policies(policies):
    """Combine per-SEAT policies into one table policy: identities are
    pinned to stable seats across hands (seat = (button + position) % P,
    the same mapping the server host uses), so the same agent keeps its
    chair while the blinds rotate around the table. Contrast with
    ``seat_policies``, whose identities are per-hand positions (position 0
    is always the current small blind)."""

    def policy(key, state, street_raises):
        pos, _, _ = head_info(state)
        seat = (state.button + pos) % state.num_seats
        actions = jnp.stack([
            jnp.asarray(p(jax.random.fold_in(key, j), state, street_raises),
                        I32)
            for j, p in enumerate(policies)])
        return jnp.sum(jnp.where(jnp.arange(len(policies)) == seat,
                                 actions, 0))

    return policy
