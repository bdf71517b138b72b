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


def test_play_hands_perpetual_counts_hands():
    from montecarlo_tpu.rollout.selfplay import play_hands_perpetual

    cfg = TableConfig(num_seats=6)
    keys = jax.random.split(jax.random.key(11), 64)
    final, hands = play_hands_perpetual(keys, cfg, n_steps=96)
    hands = int(hands)
    # 6-max random play completes a hand every ~27 actions.
    assert hands > 64, hands
    assert int(jnp.max(final.hand_idx)) >= 1
    # The reference's perpetual game mints/loses chips only via its quirks;
    # every state must stay structurally sane.
    assert bool(jnp.all(final.stacks < 10_000))


def test_pinned_seats_multihand_duplicate_match():
    """Persistent seat identities: the pretrained policy beats random with
    a CI excluding zero across 12 consecutive hands in one chair, and the
    estimator is antisymmetric under swapping the policies."""
    import os

    from montecarlo_tpu.models.policy_net import load_params, net_policy
    from montecarlo_tpu.rollout.evaluate import duplicate_match_multihand
    from montecarlo_tpu.rollout.policy import random_policy

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "policy_hu_300.npz")
    trained = net_policy(load_params(path))

    r = duplicate_match_multihand(jax.random.key(5), trained, random_policy,
                                  n_tables=512, num_hands=12)
    lo, hi = r.ci95
    assert lo > 0.0, f"trained edge CI includes zero: [{lo:.3f}, {hi:.3f}]"

    r_swap = duplicate_match_multihand(jax.random.key(5), random_policy,
                                       trained, n_tables=512, num_hands=12)
    assert abs(r.bb_per_hand + r_swap.bb_per_hand) < 1e-9


def test_per_seat_deltas_relabeling():
    from montecarlo_tpu.rollout.evaluate import per_seat_deltas

    # 1 table, 3 hands, P=3: position deltas crafted so seat 0's trajectory
    # is recoverable by hand-wise rotation.
    d = np.array([[[10, -4, -6],     # hand 0: button 0, seat s = pos s
                   [1, 2, -3],       # hand 1: button 1, seat 0 = pos 2
                   [7, -5, -2]]])    # hand 2: button 2, seat 0 = pos 1
    out = per_seat_deltas(d)
    np.testing.assert_array_equal(out[0, :, 0], [10, -3, -5])
    np.testing.assert_array_equal(out[0, :, 1], [-4, 1, -2])
    # chips conserve under relabeling
    np.testing.assert_array_equal(out.sum(-1), d.sum(-1))
