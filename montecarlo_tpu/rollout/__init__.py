"""Batched Monte Carlo rollouts: equity estimation and random-policy
self-play (the "test AIs" purpose of the reference, ``README.md:9``, scaled
to millions of concurrent tables)."""

from montecarlo_tpu.rollout.equity import (  # noqa: F401
    EquityResult,
    equity_vs_hand,
    equity_vs_random,
)
from montecarlo_tpu.rollout.policy import random_policy  # noqa: F401
from montecarlo_tpu.rollout.selfplay import play_hands, selfplay_stats  # noqa: F401
