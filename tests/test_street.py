"""Levels street form (engine.street) vs the literal layer algebra.

The levels form stores only (boundaries, n, per-seat contributions) and
derives member/original sets at observation points; these tests pin its
exact equivalence to the four-column ``engine.bets`` transcription of
``bet.clj`` — per-op on randomized algebra sequences, and per-step on full
engine trajectories under all three rule sets.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu.engine.bets import (
    empty_layers,
    merge_bets,
    remove_player,
    needed_bet,
    total_bet,
    update_bets,
)
from montecarlo_tpu.engine.state import TableConfig, init_state
from montecarlo_tpu.engine.street import (
    bets_as_layers,
    empty_street,
    street_merge,
    street_needed,
    street_to_layers,
    street_total,
    street_update,
)

L, P = 8, 6


def layers_tuple(ly):
    c = int(ly.count)
    return (tuple(np.asarray(ly.amt)[:c]), tuple(np.asarray(ly.mem)[:c]),
            tuple(np.asarray(ly.orig)[:c]), tuple(np.asarray(ly.n)[:c]), c)


def test_blinds_shape():
    """SB 5 then BB 10 must produce the canonical split layers
    [Bet 5 {sb,bb} n=2, Bet 5 {bb} n=1] (gameplay.clj:77-88)."""
    s = street_update(empty_street(L, P), 5, 0)
    s = street_update(s, 10, 1)
    ly = street_to_layers(s, jnp.zeros((P,), bool))
    assert layers_tuple(ly) == ((5, 5), (0b11, 0b10), (0b11, 0b10), (2, 1), 2)
    assert int(street_total(s)) == 10
    assert int(street_needed(s, 0)) == 5
    assert int(street_needed(s, 1)) == 0
    assert int(street_needed(s, 2)) == 10


def _random_sequences(n_seqs, n_ops, seed):
    """Engine-like op sequences: threads carry a seat's new street total
    (>= its current contribution, like update-bets is always called), folds
    and checks trigger the merge. Amounts deliberately collide with existing
    boundaries sometimes (exact calls) and split at fresh values other
    times."""
    rng = random.Random(seed)
    for i in range(n_seqs):
        ops, contrib, folded = [], [0] * P, [False] * P
        levels = set()
        for _ in range(n_ops):
            kind = rng.random()
            actors = [s for s in range(P) if not folded[s]]
            if not actors:
                break
            seat = rng.choice(actors)
            if kind < 0.55:
                base = max(contrib[seat] + 1, 1)
                if levels and rng.random() < 0.4:
                    amount = rng.choice(sorted(levels))  # exact-call collide
                    if amount <= contrib[seat]:
                        amount = base + rng.randrange(0, 12)
                else:
                    amount = base + rng.randrange(0, 12)
                contrib[seat] = max(contrib[seat], amount)
                levels.add(amount)
                ops.append(("thread", seat, amount))
            elif kind < 0.8:
                ops.append(("check", seat, 0))
            else:
                folded[seat] = True
                ops.append(("fold", seat, 0))
        yield ops


@pytest.mark.parametrize("seed", range(8))
def test_random_algebra_equivalence(seed):
    """After every op the materialized levels state must equal the literal
    layer algebra exactly — amounts, member and original bitmask sets, n
    counters, and live count."""
    for ops in _random_sequences(25, 14, seed):
        ly = empty_layers(L, P)
        st = empty_street(L, P)
        folded = jnp.zeros((P,), bool)
        folded_py = [False] * P
        for op, seat, amount in ops:
            if op == "thread":
                ly = update_bets(ly, amount, seat)
                st = street_update(st, amount, seat)
            elif op == "fold":
                folded = folded.at[seat].set(True)
                folded_py[seat] = True
                ly = merge_bets(remove_player(ly, seat))
                st = street_merge(st)
            else:  # check
                ly = merge_bets(ly)
                st = street_merge(st)
            if bool(ly.overflow) or bool(st.overflow):
                assert bool(ly.overflow) == bool(st.overflow)
                break
            got = street_to_layers(st, folded)
            assert layers_tuple(got) == layers_tuple(ly), (ops, op, seat)
            for s in range(P):
                # needed-bet is only queried for acting (non-folded) seats;
                # for folded seats the two forms legitimately differ (the
                # reference re-charges layers the fold left).
                if not folded_py[s]:
                    assert int(street_needed(st, s)) == int(needed_bet(ly, s))
            assert int(street_total(st)) == int(total_bet(ly))


def _trajectory(cfg, key, n_steps):
    """Step one table n_steps through step_table, recording a canonical
    (layers-view) snapshot after every step."""
    from montecarlo_tpu.engine.step import clamp_action, step_table
    from montecarlo_tpu.rollout.policy import random_policy

    st = init_state(key, cfg)
    snaps = []
    street_raises = jnp.zeros((), jnp.int32)
    for i in range(n_steps):
        k = jax.random.fold_in(key, 1000 + i)
        action = clamp_action(st, random_policy(k, st, street_raises))
        prev_stage, prev_idx = st.stage, st.hand_idx
        nxt = step_table(st, action, rules=cfg.rules)
        applied = (action > 0) & ~st.hand_over
        street_raises = jnp.where(
            (nxt.stage != prev_stage) | (nxt.hand_idx != prev_idx),
            0, street_raises + applied)
        st = nxt
        canon = st._replace(bets=bets_as_layers(st.bets, st.folded),
                            key=jax.random.key_data(st.key))
        snaps.append(jax.tree.map(np.asarray, canon))
    return snaps


@pytest.mark.parametrize("rules", ["reference", "standard", "tournament"])
def test_trajectory_equivalence(rules):
    """Full perpetual-table trajectories (blinds, betting, street moves,
    showdowns, redeals) must match field-for-field between bets_impl
    variants at every step, under every rule set."""
    base = dict(num_seats=6, max_layers=8, max_pot_layers=16, rules=rules)
    cfg_a = TableConfig(bets_impl="layers", **base)
    cfg_b = TableConfig(bets_impl="levels", **base)
    for t in range(2):
        key = jax.random.key(100 + t)
        snaps_a = _trajectory(cfg_a, key, 80)
        snaps_b = _trajectory(cfg_b, key, 80)
        for i, (a, b) in enumerate(zip(snaps_a, snaps_b)):
            for name, xa, xb in zip(a._fields, a, b):
                if name == "key":
                    continue
                xa = jax.tree.map(np.asarray, xa)
                xb = jax.tree.map(np.asarray, xb)
                ok = jax.tree.map(np.array_equal, xa, xb)
                assert all(jax.tree.leaves(ok)), (rules, t, i, name)


def test_play_hands_equivalence():
    """Batched play_hands must produce identical settled stacks and deltas
    across bets implementations."""
    from montecarlo_tpu.rollout.selfplay import play_hands

    base = dict(num_seats=6, max_layers=8, max_pot_layers=16)
    keys = jax.random.split(jax.random.key(7), 16)
    fa, da = play_hands(keys, TableConfig(bets_impl="layers", **base),
                        num_hands=3, collect_deltas=True)
    fb, db = play_hands(keys, TableConfig(bets_impl="levels", **base),
                        num_hands=3, collect_deltas=True)
    assert np.array_equal(np.asarray(fa.stacks), np.asarray(fb.stacks))
    assert np.array_equal(np.asarray(da), np.asarray(db))
    assert np.array_equal(np.asarray(fa.time), np.asarray(fb.time))


def test_checkpoint_roundtrip_levels(tmp_path):
    from montecarlo_tpu.engine.street import Street
    from montecarlo_tpu.utils.checkpoint import load_states, save_states

    cfg = TableConfig(num_seats=6, bets_impl="levels")
    keys = jax.random.split(jax.random.key(3), 4)
    states = jax.vmap(lambda k: init_state(k, cfg))(keys)
    path = str(tmp_path / "lv.npz")
    save_states(path, states)
    back = load_states(path)
    assert isinstance(back.bets, Street)
    eq = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        states._replace(key=jax.random.key_data(states.key)),
        back._replace(key=jax.random.key_data(back.key)))
    assert all(jax.tree.leaves(eq))


def test_public_board_levels():
    """Host projection materializes the layer view for levels states."""
    from montecarlo_tpu.engine.public import public_board

    ids = [f"p{i}" for i in range(6)]
    st_a = init_state(jax.random.key(5), TableConfig(num_seats=6))
    st_b = init_state(jax.random.key(5),
                      TableConfig(num_seats=6, bets_impl="levels"))
    assert public_board(st_a, ids) == public_board(st_b, ids)
