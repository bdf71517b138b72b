"""Hand-derived traces for the REBUILD's rule extensions.

``docs/derived_traces.md`` anchors the reference semantics with traces
derived on paper from the Clojure source. The standard and tournament
rule sets are the rebuild's own extensions (real-poker accounting /
elimination), so their anchor is a paper derivation from the DOCUMENTED
extension semantics (engine/step.py docstrings: capped payments,
all-in-for-less side pots, original-contributor payouts with
odd-chips-to-first, alive-seat rotation, freeze-at-one-survivor) —
written down BEFORE running the engine, then diffed here. The full
derivations live in docs/derived_traces.md ("Extension traces").

Trace A (standard): 3-way all-in-for-less side pot — the short stack
wins the main pot, the middle stack the side pot.
Trace B (tournament): two eliminations across two hands, blind rotation
skipping the dead seat, then the freeze.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.state import (
    TableConfig, init_state, next_hand, redeal,
)
from montecarlo_tpu.engine.step import (
    clamp_action, head_info, settle_showdown, step_action,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _full_deck(prefix):
    rest = [c for c in range(52) if c not in set(prefix)]
    return np.array(list(prefix) + rest, np.int32)


# Trace A: p0 QhQd, p1 KhKd, p2 AhAd; board 2s 7s 9c 3d 8h.
DECK_SIDEPOT = _full_deck([10, 11, 12, 23, 24, 25, 49, 26, 31, 46, 50,
                           14, 51, 6])
# Trace B hand 1: p0 AhAd, p1 KhKd, p2 2h7d; board 3s 8s 5c Jd 4h.
DECK_TOURN_H1 = _full_deck([12, 11, 0, 25, 24, 18, 49, 27, 32, 42, 50,
                            22, 51, 2])
# Trace B hand 2 (order p2,p0,p1-dead): p2 QhQd, p0 AsAc, p1 3h/4d;
# board 2d 7s 9c 5h 8d.
DECK_TOURN_H2 = _full_deck([10, 38, 1, 23, 51, 15, 47, 13, 31, 46, 48,
                            3, 49, 19])


def _check_state(st, want):
    P = st.num_seats
    assert list(np.asarray(st.stacks)) == want["stacks"], (
        want, np.asarray(st.stacks))
    assert list(np.asarray(st.all_in)) == want["all_in"]
    assert list(np.asarray(st.in_hand)) == want["in_hand"]
    assert int(st.stage) == want["stage"]
    assert int(st.n_community) == want["n_community"]
    if "head" in want:
        pos, _, exists = head_info(st)
        assert bool(exists)
        assert int(pos) == want["head"], (int(pos), want["head"])
    if want.get("hand_over"):
        assert bool(st.hand_over)


def _check_settle(st_before, st_after, want):
    pots = st_after.pots
    n = int(pots.count)
    got = []
    P = st_after.num_seats
    for j in range(n):
        orig = int(pots.orig[j])
        got.append([int(pots.amt[j]),
                    [k for k in range(P) if (orig >> k) & 1]])
    assert got == want["pots"], (got, want["pots"])
    payout = list(np.asarray(st_after.stacks - st_before.stacks))
    assert payout == want["payout"], (payout, want["payout"])
    assert list(np.asarray(st_after.stacks)) == want["stacks"]


def _drive(cfg, deck0, lines, decks=None):
    st = init_state(jax.random.key(0), cfg)
    st = redeal(st, jnp.asarray(deck0))
    for line in lines:
        if line["t"] == "override_stacks":
            st = st._replace(stacks=jnp.asarray(line["stacks"],
                                                jnp.int32))
        elif line["t"] == "action":
            a = jnp.asarray(line["amt"], jnp.int32)
            st = step_action(st, clamp_action(st, a), rules=cfg.rules)
        elif line["t"] == "state":
            _check_state(st, line)
        elif line["t"] == "settle":
            settled = settle_showdown(st, rules=cfg.rules)
            _check_settle(st, settled, line)
            st = settled
        elif line["t"] == "next_hand":
            st = next_hand(st._replace(
                hand_over=jnp.zeros((), jnp.bool_)), rules=cfg.rules)
            st = redeal(st, jnp.asarray(decks[line["deck"]]))
            assert list(np.asarray(st.stacks)) == line["stacks"]
            assert int(st.button) == line["button"]
            pos, _, exists = head_info(st)
            assert bool(exists) and int(pos) == line["head"]
        elif line["t"] == "freeze":
            st = next_hand(st._replace(
                hand_over=jnp.zeros((), jnp.bool_)), rules=cfg.rules)
            assert bool(st.hand_over)
            assert not bool(jnp.any(st.order_mask))
        else:
            raise AssertionError(line["t"])
    return st


def _load(name):
    with open(os.path.join(GOLDEN, name)) as f:
        return [json.loads(x) for x in f if x.strip()]


def test_standard_sidepot_trace_matches_paper_derivation():
    cfg = TableConfig(num_seats=3, rules="standard")
    lines = _load("derived_standard_sidepot.jsonl")
    # carried-in stacks 100/60/25 (cross-room play leaves unequal
    # stacks); blinds 5/10 already posted by init -> 95/50/25 behind
    lines = [{"t": "override_stacks", "stacks": [95, 50, 25]}] + lines
    _drive(cfg, DECK_SIDEPOT, lines)


def test_tournament_elimination_trace_matches_paper_derivation():
    cfg = TableConfig(num_seats=3, rules="tournament")
    lines = _load("derived_tournament_elim.jsonl")
    _drive(cfg, DECK_TOURN_H1, lines,
           decks={"H2": DECK_TOURN_H2})
