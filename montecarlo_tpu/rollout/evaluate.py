"""Agent evaluation harness: duplicate-deal policy matches.

The reference's stated purpose is testing AIs (``README.md:9``) but it
ships no evaluation machinery. This module provides the standard tool:
**duplicate matches** — every deck is played twice with the policies'
positions swapped, cancelling card luck so the measured edge is strategy,
not variance.

Policies are positional (position 0 posts the small blind); see
``rollout.policy.seat_policies``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import numpy as np

from montecarlo_tpu.engine.state import TableConfig
from montecarlo_tpu.rollout.policy import seat_policies
from montecarlo_tpu.rollout.selfplay import play_hands


class MatchResult(NamedTuple):
    bb_per_hand: float       # policy A's mean edge in big blinds per hand
    stderr: float            # of the duplicate-pair estimate
    n_tables: int

    @property
    def ci95(self):
        return (self.bb_per_hand - 1.96 * self.stderr,
                self.bb_per_hand + 1.96 * self.stderr)


def duplicate_match(
    key,
    policy_a: Callable,
    policy_b: Callable,
    n_tables: int = 4096,
    cfg: TableConfig = None,
) -> MatchResult:
    """Heads-up duplicate evaluation of policy A vs policy B.

    Each table key (hence each deck) is played twice: A in position 0
    (small blind) vs B, then swapped. One hand per deal (positions are
    role-based across hands, so multi-hand duplicates don't identify a
    persistent player).
    """
    cfg = cfg or TableConfig(num_seats=2, rules="standard")
    assert cfg.num_seats == 2, "duplicate matches are heads-up"
    keys = jax.random.split(key, n_tables)
    start = cfg.starting_stack

    f_ab = play_hands(keys, cfg, num_hands=1,
                      policy=seat_policies([policy_a, policy_b]))
    f_ba = play_hands(keys, cfg, num_hands=1,
                      policy=seat_policies([policy_b, policy_a]))

    a_sb = np.asarray(f_ab.stacks)[:, 0] - start  # A as small blind
    a_bb = np.asarray(f_ba.stacks)[:, 1] - start  # A as big blind, same deck
    per_pair = (a_sb + a_bb) / 2.0                # chips per hand, de-lucked
    bb = per_pair / float(cfg.big_blind)
    return MatchResult(
        bb_per_hand=float(bb.mean()),
        stderr=float(bb.std(ddof=1) / np.sqrt(n_tables)),
        n_tables=n_tables,
    )


def per_seat_deltas(deltas, button0: int = 0) -> np.ndarray:
    """[tables, hands, P] position-indexed chip deltas -> seat-indexed.

    ``play_hands`` reports hand deltas by hand-order POSITION (0 = that
    hand's small blind); the button advances one seat per hand, so seat
    ``s`` sat at position ``(s - button_h) % P`` in hand ``h`` with
    ``button_h = button0 + h``. Pure relabeling — chips are untouched.
    """
    d = np.asarray(deltas)
    _, H, P = d.shape
    return np.stack([np.roll(d[:, h, :], (button0 + h) % P, axis=-1)
                     for h in range(H)], axis=1)


def duplicate_match_multihand(
    key,
    policy_a: Callable,
    policy_b: Callable,
    n_tables: int = 2048,
    num_hands: int = 12,
    cfg: TableConfig = None,
) -> MatchResult:
    """Heads-up duplicate evaluation with PERSISTENT seat identities:
    policy A keeps one chair for ``num_hands`` consecutive hands (stacks
    carry over, blinds rotate past it), then the whole match replays with
    chairs swapped on the same per-hand decks.

    Duplicate cancellation is exact on hand 0 and approximate afterwards
    (decks per hand index match across the two runs, but stack trajectories
    diverge with the policies). The estimate aggregates per table (hands
    within a table are correlated through the carried stacks) and reports
    policy A's mean bb/hand edge with a table-level stderr.
    """
    from montecarlo_tpu.rollout.policy import pinned_seat_policies

    cfg = cfg or TableConfig(num_seats=2, rules="standard")
    assert cfg.num_seats == 2, "duplicate matches are heads-up"
    keys = jax.random.split(key, n_tables)

    _, d_ab = play_hands(keys, cfg, num_hands=num_hands,
                         policy=pinned_seat_policies([policy_a, policy_b]),
                         collect_deltas=True)
    _, d_ba = play_hands(keys, cfg, num_hands=num_hands,
                         policy=pinned_seat_policies([policy_b, policy_a]),
                         collect_deltas=True)
    a_first = per_seat_deltas(d_ab)[:, :, 0]   # A's chips/hand in chair 0
    b_first = per_seat_deltas(d_ba)[:, :, 0]   # B's chips/hand in chair 0
    per_pair = (a_first - b_first) / 2.0       # zero-sum heads-up
    bb_table = per_pair.mean(axis=1) / float(cfg.big_blind)  # per table
    return MatchResult(
        bb_per_hand=float(bb_table.mean()),
        stderr=float(bb_table.std(ddof=1) / np.sqrt(n_tables)),
        n_tables=n_tables,
    )
