"""Tournament mode: true elimination under standard accounting.

Busted seats leave the deal (masks shrink, shapes fixed), blinds advance
over eliminated seats, and the table freezes once one player holds all the
chips. The reference has no such mode (its busted players play forever,
``gameplay.clj:149-150``); accounting is the repo's "standard" rules, so
chips conserve exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.state import (
    TableConfig,
    init_state,
    next_hand,
)
from montecarlo_tpu.engine.step import step_table
from montecarlo_tpu.rollout.selfplay import (
    play_tournament,
    tournament_placements,
)

I32 = jnp.int32


def _cfg(**kw):
    kw.setdefault("num_seats", 6)
    kw.setdefault("rules", "tournament")
    kw.setdefault("small_blind", 25)
    kw.setdefault("big_blind", 50)
    kw.setdefault("max_layers", 16)
    kw.setdefault("max_pot_layers", 48)
    return TableConfig(**kw)


def test_blinds_advance_over_eliminated_seats():
    cfg = _cfg(small_blind=5, big_blind=10)
    st = init_state(jax.random.key(0), cfg)
    # Kill position 1 and 2; rotation must skip them: new SB = old pos 3.
    st = st._replace(stacks=jnp.array([100, 0, 0, 100, 100, 100], I32))
    nxt = next_hand(st, rules="tournament")
    # Rolled by 3: new frame = old positions [3, 4, 5, 0, 1, 2].
    assert int(nxt.button) == (int(st.button) + 3) % 6
    np.testing.assert_array_equal(
        np.asarray(nxt.in_hand), [True, True, True, True, False, False])
    # SB posted by new position 0, BB by new position 1 (both alive).
    np.testing.assert_array_equal(
        np.asarray(nxt.stacks), [95, 90, 100, 100, 0, 0])
    assert int(nxt.cursor) == 2


def test_bb_skips_dead_seat_between_blinds():
    cfg = _cfg(small_blind=5, big_blind=10)
    st = init_state(jax.random.key(1), cfg)
    # Old position 2 dead -> new frame [1, 2-dead, 3, 4, 5, 0]:
    st = st._replace(stacks=jnp.array([100, 100, 0, 100, 100, 100], I32))
    nxt = next_hand(st, rules="tournament")
    # New position 1 is dead, so the BB goes to new position 2 and action
    # starts at position 3.
    np.testing.assert_array_equal(
        np.asarray(nxt.stacks), [95, 0, 90, 100, 100, 100])
    np.testing.assert_array_equal(
        np.asarray(nxt.in_hand), [True, False, True, True, True, True])
    assert int(nxt.cursor) == 3


def test_table_freezes_with_single_survivor():
    cfg = _cfg()
    st = init_state(jax.random.key(2), cfg)
    st = st._replace(stacks=jnp.array([600, 0, 0, 0, 0, 0], I32))
    frozen = next_hand(st, rules="tournament")
    assert bool(frozen.hand_over)
    assert int(frozen.pots.count) == 0 and int(frozen.bets.count) == 0
    # Idempotent under further next_hand and step_table.
    again = next_hand(frozen, rules="tournament")
    assert bool(again.hand_over)
    np.testing.assert_array_equal(np.asarray(again.stacks),
                                  np.asarray(frozen.stacks))
    stepped = step_table(frozen, jnp.zeros((), I32), rules="tournament")
    np.testing.assert_array_equal(np.asarray(stepped.stacks),
                                  np.asarray(frozen.stacks))
    assert int(np.asarray(stepped.stacks).sum()) == 600


def test_tournaments_terminate_conserve_and_crown_a_winner():
    """Property: big-blind pressure forces termination; chips conserve at
    every table; the frozen table's survivor holds all 600 chips; exactly
    P-1 seats have bust times; placements are a permutation of 1..P."""
    cfg = _cfg()  # blinds 25/50 vs 100 stacks: fast eliminations
    n_tables, max_hands = 256, 64
    keys = jax.random.split(jax.random.key(3), n_tables)
    final, busted, seat_stacks = play_tournament(keys, cfg, max_hands)

    stacks = np.asarray(seat_stacks, np.int64)
    busted = np.asarray(busted, np.int64)
    total = cfg.num_seats * cfg.starting_stack
    # Chip conservation on every table (standard accounting).
    np.testing.assert_array_equal(stacks.sum(axis=1),
                                  np.full(n_tables, total))
    # Terminated = one seat alive (hand_over merely marks a settled hand).
    done = (stacks > 0).sum(axis=1) == 1
    assert done.mean() > 0.95, f"only {done.mean():.0%} terminated"
    d = done.nonzero()[0]
    # Terminated tables: one seat holds everything, P-1 busts recorded.
    assert ((stacks[d] == total).sum(axis=1) == 1).all()
    assert ((stacks[d] == 0).sum(axis=1) == cfg.num_seats - 1).all()
    assert ((busted[d] <= max_hands).sum(axis=1) == cfg.num_seats - 1).all()

    places = tournament_placements(busted, seat_stacks)
    assert places.shape == (n_tables, cfg.num_seats)
    np.testing.assert_array_equal(
        np.sort(places, axis=1),
        np.tile(np.arange(1, cfg.num_seats + 1), (n_tables, 1)))
    # Winner (place 1) is the seat holding all the chips.
    win_seat = places[d].argmin(axis=1)
    assert (stacks[d, win_seat] == total).all()


def test_heads_up_tournament():
    cfg = _cfg(num_seats=2, small_blind=25, big_blind=50)
    keys = jax.random.split(jax.random.key(4), 128)
    final, busted, seat_stacks = play_tournament(keys, cfg, 48)
    del final
    stacks = np.asarray(seat_stacks, np.int64)
    np.testing.assert_array_equal(stacks.sum(axis=1), np.full(128, 200))
    done = (stacks > 0).sum(axis=1) == 1
    assert done.mean() > 0.95
    assert ((stacks[done] == 200).sum(axis=1) == 1).all()
