"""Bet-layer algebra conformance tests.

Revives the reference's commented-out algebra specs
(``test/montecarlo/core_test.clj:54-90``) and adds explicit tests for the
quirks the rebuild must preserve bit-exactly (n-inflation on re-threading,
later-layer-n-wins merging, fold member removal).
"""

import jax.numpy as jnp
import pytest

from montecarlo_tpu.engine.bets import (
    Layers,
    empty_layers,
    merge_bets,
    needed_bet,
    remove_player,
    total_bet,
    update_bets,
)

L, P = 8, 4  # capacity, seats (seats are 0-indexed; tests use 0,1,2 for p1,p2,p3)


def mk(layers_spec):
    """Build Layers from [(amt, members, orig, n), ...] (bitmask sets)."""
    amt = [0] * L
    mem = [0] * L
    orig = [0] * L
    n = [0] * L
    for i, (a, m, o, k) in enumerate(layers_spec):
        amt[i] = a
        for s in m:
            mem[i] |= 1 << s
        for s in o:
            orig[i] |= 1 << s
        n[i] = k
    return Layers(
        amt=jnp.array(amt, jnp.int32),
        mem=jnp.array(mem, jnp.int32),
        orig=jnp.array(orig, jnp.int32),
        n=jnp.array(n, jnp.int32),
        count=jnp.array(len(layers_spec), jnp.int32),
        overflow=jnp.zeros((), jnp.bool_),
    )


def spec(layers):
    """Layers -> [(amt, members, orig, n), ...] python view."""
    from tests.util import layers_spec as _ls

    return _ls(layers, P)


def fs(*xs):
    return frozenset(xs)


def test_update_bets_initial():
    # (update-bets [] (->Bet 10 #{1})) => [b1]   core_test.clj:82-84
    out = update_bets(empty_layers(L, P), 10, 0)
    assert spec(out) == [(10, fs(0), fs(0), 1)]
    assert not bool(out.overflow)


def test_update_bets_additional():
    # [b1] + Bet(20,{2}) => [Bet(10,{1,2}), Bet(10,{2})]   core_test.clj:85-87
    b1 = mk([(10, [0], [0], 1)])
    out = update_bets(b1, 20, 1)
    assert spec(out) == [(10, fs(0, 1), fs(0, 1), 2), (10, fs(1), fs(1), 1)]


def test_update_bets_split():
    # [b1a b2a] + Bet(15,{3}) => [Bet(10,{1,2,3}), Bet(5,{2,3}), Bet(5,{2})]
    # core_test.clj:88-90 — side-pot creation by splitting the second layer.
    st = mk([(10, [0, 1], [0, 1], 2), (10, [1], [1], 1)])
    out = update_bets(st, 15, 2)
    assert spec(out) == [
        (10, fs(0, 1, 2), fs(0, 1, 2), 3),
        (5, fs(1, 2), fs(1, 2), 2),
        (5, fs(1), fs(1), 1),
    ]


def test_update_bets_exact_call():
    # Blinds then a flat call: preflop caller threads the full total.
    st = empty_layers(L, P)
    st = update_bets(st, 5, 0)   # small blind
    st = update_bets(st, 10, 1)  # big blind
    assert spec(st) == [(5, fs(0, 1), fs(0, 1), 2), (5, fs(1), fs(1), 1)]
    st = update_bets(st, 10, 2)  # p3 calls 10
    assert spec(st) == [(5, fs(0, 1, 2), fs(0, 1, 2), 3),
                        (5, fs(1, 2), fs(1, 2), 2)]


def test_update_bets_n_inflation_quirk():
    # The small blind completing preflop threads the full 10 through layers it
    # already belongs to: membership unchanged but n inflates (bet.clj:37-43
    # via board.clj:45-71) — payouts use the inflated n (gameplay.clj:112).
    st = mk([(5, [0, 1, 2], [0, 1, 2], 3), (5, [1, 2], [1, 2], 2)])
    out = update_bets(st, 10, 0)
    assert spec(out) == [(5, fs(0, 1, 2), fs(0, 1, 2), 4),
                         (5, fs(0, 1, 2), fs(0, 1, 2), 3)]


def test_merge_bets_reference_cases():
    # core_test.clj:54-70: [b1 b2 b3] -> [b12 b3]; [b1 b2 b3 b4] -> [b12 b34]
    b1 = (5, [0, 1, 2], [0, 1, 2], 3)
    b2 = (5, [0, 1, 2], [0, 1, 2], 3)
    b3 = (10, [0, 1], [0, 1], 2)
    b4 = (10, [0, 1], [0, 1], 2)
    out = merge_bets(mk([b1, b2, b3]))
    assert spec(out) == [(10, fs(0, 1, 2), fs(0, 1, 2), 3), (10, fs(0, 1), fs(0, 1), 2)]
    out = merge_bets(mk([b1, b2, b3, b4]))
    assert spec(out) == [(10, fs(0, 1, 2), fs(0, 1, 2), 3), (20, fs(0, 1), fs(0, 1), 2)]


def test_merge_bets_later_n_wins():
    # merge-bets constructs the merged layer from the *later* input layer
    # (bet.clj:20-23), so its n survives.
    out = merge_bets(mk([(5, [0, 1], [0, 1], 7), (5, [0, 1], [0, 1], 3)]))
    assert spec(out) == [(10, fs(0, 1), fs(0, 1), 3)]


def test_merge_bets_requires_both_sets_equal():
    # Same members but different original-players must NOT merge.
    out = merge_bets(mk([(5, [0, 1], [0, 1, 2], 2), (5, [0, 1], [0, 1], 2)]))
    assert int(out.count) == 2


def test_merge_bets_cascades():
    out = merge_bets(mk([(1, [0], [0], 1), (2, [0], [0], 1), (3, [0], [0], 9)]))
    assert spec(out) == [(6, fs(0), fs(0), 9)]


def test_fold_remove_then_merge():
    # Folding removes the seat from members of every layer, original-players
    # untouched (board.clj:37-41); coalesce only where both sets now match.
    st = mk([(5, [0, 1, 2], [0, 1], 3), (5, [0, 1, 2], [0, 1], 2)])
    out = merge_bets(remove_player(st, 2))
    assert spec(out) == [(10, fs(0, 1), fs(0, 1), 2)]

    st2 = mk([(5, [0, 1, 2], [0, 1, 2], 3), (5, [1, 2], [1, 2], 2)])
    out2 = merge_bets(remove_player(st2, 2))
    assert spec(out2) == [(5, fs(0, 1), fs(0, 1, 2), 3), (5, fs(1), fs(1, 2), 2)]


def test_total_and_needed_bet():
    # core_test.clj:92-119 (integer amounts; the reference's float example is
    # outside the chip domain).
    st = mk([(5, [0, 1], [0, 1], 2), (20, [1], [1], 1)])
    assert int(total_bet(st)) == 25
    assert int(needed_bet(st, 0)) == 20
    assert int(needed_bet(st, 1)) == 0
    assert int(needed_bet(st, 2)) == 25


def test_overflow_latches():
    st = empty_layers(2, P)
    st = update_bets(st, 5, 0)
    st = update_bets(st, 10, 1)
    assert not bool(st.overflow) and int(st.count) == 2
    st = update_bets(st, 20, 2)  # needs a third layer -> dropped, latched
    assert bool(st.overflow)
    assert int(st.count) == 2


def test_update_bets_batch_vmap():
    import jax

    base = mk([(10, [0, 1], [0, 1], 2), (10, [1], [1], 1)])
    batch = jax.tree.map(lambda a: jnp.stack([a, a]), base)
    amts = jnp.array([15, 25], jnp.int32)
    seats = jnp.array([2, 2], jnp.int32)
    out = jax.vmap(update_bets)(batch, amts, seats)
    row0 = jax.tree.map(lambda a: a[0], out)
    row1 = jax.tree.map(lambda a: a[1], out)
    assert spec(row0) == [
        (10, fs(0, 1, 2), fs(0, 1, 2), 3),
        (5, fs(1, 2), fs(1, 2), 2),
        (5, fs(1), fs(1), 1),
    ]
    assert spec(row1) == [
        (10, fs(0, 1, 2), fs(0, 1, 2), 3),
        (10, fs(1, 2), fs(1, 2), 2),
        (5, fs(2), fs(2), 1),
    ]


def test_merge_bets_fuzz_vs_python_reference():
    """Randomized layer configurations (adjacent duplicates, multi-group
    runs, non-adjacent equal sets that must NOT merge) against a literal
    Python transcription of bet.clj merge-bets."""
    import random as _random

    rng = _random.Random(0xF00D)

    def py_merge(rows):
        out = []
        for amt, mem, orig, n in rows:
            if out and out[-1][1] == mem and out[-1][2] == orig:
                prev = out.pop()
                out.append((prev[0] + amt, mem, orig, n))  # later n wins
            else:
                out.append((amt, mem, orig, n))
        return out

    L = 10
    for trial in range(300):
        k = rng.randint(0, L)
        masks = [rng.randint(1, 7) for _ in range(4)]
        rows = []
        for _ in range(k):
            m = rng.choice(masks)
            o = m | rng.choice(masks)
            rows.append((rng.randint(1, 30), m, o, rng.randint(1, 5)))
        layers = Layers(
            amt=jnp.array([r[0] for r in rows] + [0] * (L - k), jnp.int32),
            mem=jnp.array([r[1] for r in rows] + [0] * (L - k), jnp.int32),
            orig=jnp.array([r[2] for r in rows] + [0] * (L - k), jnp.int32),
            n=jnp.array([r[3] for r in rows] + [0] * (L - k), jnp.int32),
            count=jnp.asarray(k, jnp.int32),
            overflow=jnp.zeros((), jnp.bool_),
        )
        got = merge_bets(layers)
        want = py_merge(rows)
        assert int(got.count) == len(want), (trial, rows, want)
        for i, (amt, mem, orig, n) in enumerate(want):
            assert int(got.amt[i]) == amt, (trial, i, rows)
            assert int(got.mem[i]) == mem
            assert int(got.orig[i]) == orig
            assert int(got.n[i]) == n
        for i in range(len(want), L):
            assert int(got.amt[i]) == 0 and int(got.mem[i]) == 0
