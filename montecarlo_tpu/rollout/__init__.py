"""Batched Monte Carlo rollouts: equity estimation and random-policy
self-play (the "test AIs" purpose of the reference, ``README.md:9``, scaled
to millions of concurrent tables)."""

from montecarlo_tpu.rollout.equity import (  # noqa: F401
    EquityResult,
    canonical_hands,
    equity_exact,
    equity_vs_hand,
    equity_vs_random,
    equity_vs_range,
    expand_range,
)
from montecarlo_tpu.rollout.evaluate import MatchResult, duplicate_match  # noqa: F401
from montecarlo_tpu.rollout.policy import (  # noqa: F401
    always_call,
    random_policy,
    seat_policies,
    tight_policy,
)
from montecarlo_tpu.rollout.selfplay import play_hands, selfplay_stats  # noqa: F401
