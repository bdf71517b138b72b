"""Batched self-play (BASELINE config 4, scaled down for CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.state import TableConfig
from montecarlo_tpu.rollout.selfplay import play_hands, selfplay_stats


def test_selfplay_completes_and_is_deterministic():
    cfg = TableConfig(num_seats=6, max_layers=16, max_pot_layers=48)
    keys = jax.random.split(jax.random.key(42), 64)
    final = play_hands(keys, cfg, num_hands=2)

    assert bool(jnp.all(final.hand_over)), "some hands did not complete"
    assert not bool(jnp.any(final.bets.overflow))
    assert not bool(jnp.any(final.pots.overflow))
    assert int(jnp.max(final.hand_idx)) == 1  # 2 hands: idx 0, 1
    assert bool(jnp.all(final.time > 0))

    again = play_hands(keys, cfg, num_hands=2)
    np.testing.assert_array_equal(np.asarray(final.stacks),
                                  np.asarray(again.stacks))

    stats = selfplay_stats(final)
    assert stats["tables"] == 64


def test_selfplay_heads_up():
    cfg = TableConfig(num_seats=2, max_layers=16, max_pot_layers=48)
    keys = jax.random.split(jax.random.key(3), 32)
    final = play_hands(keys, cfg, num_hands=1)
    assert bool(jnp.all(final.hand_over))


def test_seat_policies_agent_vs_agent():
    # A calling station vs a tight folder, heads-up, standard rules: the
    # caller should not lose chips to a strategy that folds half its hands
    # preflop (folding surrenders the blind).
    from functools import partial as _partial

    from montecarlo_tpu.rollout.policy import (
        always_call, seat_policies, tight_policy,
    )

    cfg = TableConfig(num_seats=2, rules="standard")
    policy = seat_policies([always_call, tight_policy])
    keys = jax.random.split(jax.random.key(17), 256)
    final = play_hands(keys, cfg, num_hands=1, policy=policy)
    assert bool(jnp.all(final.hand_over))
    # Chip conservation per table under standard rules.
    sums = np.asarray(final.stacks).sum(axis=1)
    np.testing.assert_array_equal(sums, np.full_like(sums, 200))
    # Position 0 (the caller, SB this hand) profits on average: the tight
    # player folds ~half the time, surrendering the big blind.
    mean0 = float(np.asarray(final.stacks)[:, 0].mean())
    assert mean0 > 100.0, mean0


def test_duplicate_match_detects_edges():
    from montecarlo_tpu.rollout.evaluate import duplicate_match
    from montecarlo_tpu.rollout.policy import always_call, random_policy, tight_policy

    # Caller vs half-folder: folding surrenders blinds -> caller wins.
    r = duplicate_match(jax.random.key(5), always_call, tight_policy,
                        n_tables=1024)
    assert r.bb_per_hand > 0.1, (r.bb_per_hand, r.stderr)

    # Self-match is a statistical zero.
    r0 = duplicate_match(jax.random.key(6), always_call, always_call,
                         n_tables=1024)
    assert abs(r0.bb_per_hand) < 6 * max(r0.stderr, 1e-9), r0


def test_collect_deltas_and_position_winrates():
    from montecarlo_tpu.rollout.selfplay import position_winrates

    cfg = TableConfig(num_seats=3, rules="standard")
    keys = jax.random.split(jax.random.key(23), 128)
    final, deltas = play_hands(keys, cfg, num_hands=4, collect_deltas=True)
    assert deltas.shape == (128, 4, 3)
    # Standard rules conserve chips: per-table-per-hand deltas sum to zero.
    np.testing.assert_array_equal(
        np.asarray(deltas.sum(axis=2)), np.zeros((128, 4), np.int32))
    # And cumulative deltas reconstruct... positions rotate, so check the
    # grand total matches the final stacks vs starting stacks.
    assert int(np.asarray(deltas).sum()) == int(
        np.asarray(final.stacks).sum()) - 128 * 300
    mean_bb, se = position_winrates(deltas, cfg.big_blind)
    assert mean_bb.shape == (3,) and np.all(np.isfinite(se))
