"""Trajectory conformance: array engine vs literal-semantics oracle.

Random games (2-6 players, random folds/calls/raises including exact
all-ins and over-raises) are driven simultaneously through the fixed-shape
array engine and the ``tests.oracle_engine`` transcription of the Clojure
reference; every intermediate public state must match exactly, as must the
final settled stacks.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu.engine import (
    TableConfig,
    clamp_action,
    head_info,
    init_state,
    redeal,
    settle_showdown,
    step_action,
)
from tests.oracle_engine import OracleGame
from tests.util import layers_spec


def engine_snapshot(st):
    over = bool(st.hand_over)
    return {
        "bets": layers_spec(st.bets),
        "pots": layers_spec(st.pots),
        "stacks": np.asarray(st.stacks).tolist(),
        "in_hand": frozenset(np.nonzero(np.asarray(st.in_hand))[0].tolist()),
        "remaining": frozenset(np.nonzero(np.asarray(st.to_act))[0].tolist()),
        "stage": int(st.stage),
        "time": int(st.time),
        "n_revealed": int(st.n_community),
        "head": None if over else int(head_info(st)[0]),
        "over": over,
    }


def oracle_snapshot(g):
    s = g.snapshot()
    s["bets"] = [tuple(x) for x in s["bets"]]
    s["pots"] = [tuple(x) for x in s["pots"]]
    return s


def gen_action(rng, g):
    head = g.head()
    u = rng.random()
    if u < 0.20:
        return -1
    if u < 0.65:
        return 0
    if u < 0.75:
        # exact all-in raise (board.clj:80-89 removal path)
        amt = g.stacks[head] - g.needed(head)
        return amt if amt > 0 else 0
    if u < 0.85:
        return rng.randint(30, 500)  # over-raise -> clamped
    return rng.randint(1, 25)


@pytest.mark.parametrize("n_seats,seed", [
    (2, 0), (2, 1), (3, 2), (3, 3), (3, 4),
    (4, 5), (4, 6), (6, 7), (6, 8), (6, 9),
    (3, 10), (6, 11), (2, 12), (4, 13), (6, 14),
    (8, 15), (9, 16),  # full-ring tables
])
def test_random_game_trajectory(n_seats, seed):
    rng = random.Random(seed)
    deck = list(range(52))
    rng.shuffle(deck)

    cfg = TableConfig(num_seats=n_seats, max_layers=24, max_pot_layers=64)
    st = redeal(init_state(jax.random.key(seed), cfg),
                jnp.array(deck, jnp.int32))
    g = OracleGame(n=n_seats, small=5, big=10, deck=deck)

    assert engine_snapshot(st) == oracle_snapshot(g)

    for step in range(300):
        if g.over:
            break
        raw = gen_action(rng, g)
        a_eng = int(clamp_action(st, jnp.asarray(raw, jnp.int32)))
        a_orc = g.clamp(raw)
        assert a_eng == a_orc, (step, raw, a_eng, a_orc)
        st = step_action(st, jnp.asarray(a_eng, jnp.int32))
        g.act(a_orc)
        assert not bool(st.bets.overflow) and not bool(st.pots.overflow)
        assert engine_snapshot(st) == oracle_snapshot(g), f"step {step}"
    else:
        pytest.fail("game did not terminate in 300 actions")

    st = settle_showdown(st)
    g.settle()
    assert np.asarray(st.stacks).tolist() == g.stacks
    assert layers_spec(st.pots) == [tuple(x) for x in oracle_snapshot(g)["pots"]]


@pytest.mark.parametrize("n_seats,seed", [(2, 100), (3, 101), (4, 102),
                                          (6, 103)])
def test_multi_hand_trajectory(n_seats, seed):
    """Perpetual-hand conformance (gameplay.clj:122-150): three consecutive
    hands with settle -> rotate -> re-deal; stacks persist per player,
    busted players keep playing, blinds go negative — all vs the oracle."""
    from montecarlo_tpu.engine import next_hand

    rng = random.Random(seed)
    cfg = TableConfig(num_seats=n_seats, max_layers=24, max_pot_layers=64)
    st = init_state(jax.random.key(seed), cfg)
    oracle_stacks = [100] * n_seats  # by current hand-order position

    for hand in range(3):
        deck = list(range(52))
        rng.shuffle(deck)
        st = redeal(st, jnp.array(deck, jnp.int32))
        g = OracleGame(n=n_seats, small=5, big=10, deck=deck,
                       stacks=list(oracle_stacks))
        assert engine_snapshot(st) == oracle_snapshot(g), f"hand {hand} deal"

        for step in range(300):
            if g.over:
                break
            raw = gen_action(rng, g)
            a = int(clamp_action(st, jnp.asarray(raw, jnp.int32)))
            assert a == g.clamp(raw)
            st = step_action(st, jnp.asarray(a, jnp.int32))
            g.act(a)
            assert engine_snapshot(st) == oracle_snapshot(g), \
                f"hand {hand} step {step}"
        else:
            pytest.fail("no termination")

        st = settle_showdown(st)
        g.settle()
        assert np.asarray(st.stacks).tolist() == g.stacks, f"hand {hand}"

        # Rotate into the next hand: oracle stacks shift one position left
        # (players-list rotation), engine rolls positionally.
        oracle_stacks = g.stacks[1:] + g.stacks[:1]
        st = next_hand(st)
        assert int(st.button) == (hand + 1) % n_seats
        # Engine already posted blinds for the new hand; compare pre-blind.
        pre = np.asarray(st.stacks).copy()
        pre[0] += 5
        pre[1] += 10
        assert pre.tolist() == oracle_stacks, f"hand {hand} rotation"


@pytest.mark.parametrize("n_seats,seed", [(2, 20), (3, 21), (6, 22),
                                          (6, 23), (9, 24)])
def test_random_game_trajectory_levels(n_seats, seed):
    """The levels street form (TableConfig(bets_impl="levels")) against the
    oracle DIRECTLY — per-step snapshot equality of the materialized layer
    view, independent of the layers-engine equivalence tests."""
    from montecarlo_tpu.engine.street import bets_as_layers

    rng = random.Random(seed)
    deck = list(range(52))
    rng.shuffle(deck)

    cfg = TableConfig(num_seats=n_seats, max_layers=24, max_pot_layers=64,
                      bets_impl="levels")
    st = redeal(init_state(jax.random.key(seed), cfg),
                jnp.array(deck, jnp.int32))
    g = OracleGame(n=n_seats, small=5, big=10, deck=deck)

    def snap(state):
        return engine_snapshot(
            state._replace(bets=bets_as_layers(state.bets, state.folded)))

    assert snap(st) == oracle_snapshot(g)
    for step in range(300):
        if g.over:
            break
        raw = gen_action(rng, g)
        a_eng = int(clamp_action(st, jnp.asarray(raw, jnp.int32)))
        assert a_eng == g.clamp(raw), (step, raw)
        st = step_action(st, jnp.asarray(a_eng, jnp.int32))
        g.act(a_eng)
        assert snap(st) == oracle_snapshot(g), f"step {step}"
    else:
        pytest.fail("game did not terminate in 300 actions")

    st = settle_showdown(st)
    g.settle()
    assert np.asarray(st.stacks).tolist() == g.stacks
