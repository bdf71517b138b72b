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
