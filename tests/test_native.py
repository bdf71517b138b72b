"""Native C++ runtime conformance: evaluator and table engine vs the oracle."""

import itertools
import random

import numpy as np
import pytest

from montecarlo_tpu import native
from montecarlo_tpu.ops.ref_evaluator import ref_eval_best
from tests.oracle_engine import OracleGame
from tests.test_conformance import gen_action

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_eval7_vs_oracle():
    rng = random.Random(99)
    hands = [rng.sample(range(52), 7) for _ in range(3000)]
    got = native.eval7_batch(np.array(hands, dtype=np.int32))
    want = np.array([ref_eval_best(h) for h in hands], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def _native_snapshot_matches(g, t):
    s = g.snapshot()
    nt = t.snapshot()
    assert nt["stacks"] == s["stacks"]
    assert nt["in_hand"] == s["in_hand"]
    assert nt["remaining"] == s["remaining"]
    assert nt["stage"] == s["stage"]
    assert nt["time"] == s["time"]
    assert nt["n_revealed"] == s["n_revealed"]
    assert nt["over"] == s["over"]
    assert nt["head"] == s["head"]
    assert nt["bets"] == [tuple(x) for x in s["bets"]]
    assert nt["pots"] == [tuple(x) for x in s["pots"]]


@pytest.mark.parametrize("n_seats,seed", [(2, 21), (3, 22), (4, 23), (6, 24),
                                          (3, 25), (6, 26)])
def test_native_table_trajectory_vs_oracle(n_seats, seed):
    rng = random.Random(seed)
    deck = list(range(52))
    rng.shuffle(deck)

    g = OracleGame(n=n_seats, small=5, big=10, deck=deck)
    t = native.NativeTable(n_seats, 5, 10, deck)
    _native_snapshot_matches(g, t)

    for _ in range(300):
        if g.over:
            break
        raw = gen_action(rng, g)
        assert t.clamp(raw) == g.clamp(raw)
        t.act(raw)
        g.act(g.clamp(raw))
        _native_snapshot_matches(g, t)
    else:
        pytest.fail("game did not terminate")

    t.settle()
    g.settle()
    assert t.snapshot()["stacks"] == g.stacks


def test_native_custom_stacks_all_in_side_pot():
    deck = list(range(52))
    g = OracleGame(n=3, small=5, big=10, deck=deck, stacks=[100, 100, 40])
    t = native.NativeTable(3, 5, 10, deck, stacks=[100, 100, 40])
    for a in [30, 0, 0, 0, 0, 0, 0, 0, 0]:
        t.act(a)
        g.act(g.clamp(a))
        _native_snapshot_matches(g, t)
    assert g.over
    t.settle()
    g.settle()
    assert t.snapshot()["stacks"] == g.stacks


def test_native_vs_jnp_evaluator_1M_hands():
    # Large-sample cross-certification of the two fast evaluators (the
    # oracle pins them both on smaller samples + golden vectors).
    import jax.numpy as jnp

    from montecarlo_tpu.ops.evaluator import eval7_from_cards

    rng = np.random.default_rng(2024)
    hands = np.empty((1_000_000, 7), dtype=np.int32)
    for i in range(0, hands.shape[0], 100_000):
        block = np.argsort(rng.random((100_000, 52)), axis=1)[:, :7]
        hands[i:i + 100_000] = block
    got_native = native.eval7_batch(hands)
    got_jnp = np.asarray(eval7_from_cards(jnp.asarray(hands)))
    np.testing.assert_array_equal(got_native, got_jnp)


def test_native_cmp_key_bit_exact_vs_jax():
    """The C++ cmp key (mc_eval7_cmp) must equal eval_masks_cmp_impl
    bit-for-bit: native/certify_evaluator.cpp proves the cmp<->packed order
    isomorphism exhaustively over all C(52,7) hands USING the C++ twin, so
    this bit-exactness is the link that extends that proof to the JAX key
    the Pallas kernels compare with."""
    import jax.numpy as jnp

    from montecarlo_tpu.ops.evaluator import (
        eval_masks_cmp, suit_masks_from_cards,
    )

    rng = np.random.default_rng(7)
    hands = np.argsort(rng.random((200_000, 52)), axis=1)[:, :7].astype(
        np.int32)
    # Structured coverage: quads/boats/flushes/straights on stacked ranks
    # (rank r lives at ids r, r+13, r+26, r+39).
    structured = []
    for r in range(0, 9):
        structured.append([r, r + 13, r + 26, r + 39,
                           r + 1, r + 14, r + 2])            # quads + pair
        structured.append([r, r + 1, r + 2, r + 3,
                           r + 4, r + 18, r + 31])           # straight flush
        structured.append([r, r + 13, r + 1, r + 14,
                           r + 2, r + 15, r + 29])           # three pairs
    hands = np.concatenate([hands, np.asarray(structured, np.int32)])
    got_native = native.eval7_cmp_batch(hands)
    got_jax = np.asarray(
        eval_masks_cmp(*suit_masks_from_cards(jnp.asarray(hands)))
    ).astype(np.uint32)
    np.testing.assert_array_equal(got_native, got_jax)
