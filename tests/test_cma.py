"""CMA-ES sanity: converges on smooth low-dim maximization problems.

The optimizer drives the adaptive rule-bot exploitability probe
(scripts/opt_bot.py); these tests pin its math on CPU toys.
"""

import numpy as np

from montecarlo_tpu.models.cma import CMAES


def test_cma_sphere():
    target = np.array([1.5, -2.0, 0.5, 3.0, -1.0, 0.0, 2.5, -0.5])
    es = CMAES(np.zeros(8), sigma0=1.0, popsize=16, seed=3)
    for _ in range(120):
        x = es.ask()
        es.tell(-np.sum((x - target[None]) ** 2, axis=1))
    assert np.allclose(es.mean, target, atol=1e-2)


def test_cma_rosenbrock_2d():
    es = CMAES([-1.0, 1.0], sigma0=0.5, popsize=12, seed=1)
    for _ in range(300):
        x = es.ask()
        f = -(100.0 * (x[:, 1] - x[:, 0] ** 2) ** 2 + (1 - x[:, 0]) ** 2)
        es.tell(f)
    assert np.allclose(es.mean, [1.0, 1.0], atol=5e-2)


def test_cma_bounds_respected():
    lo, hi = np.full(4, -0.5), np.full(4, 0.5)
    es = CMAES(np.zeros(4), sigma0=1.0, popsize=10, seed=0,
               lower=lo, upper=hi)
    for _ in range(20):
        x = es.ask()
        assert np.all(x >= lo[None] - 1e-12)
        assert np.all(x <= hi[None] + 1e-12)
        es.tell(-np.sum(x ** 2, axis=1))


def test_opt_bot_family_dispatch():
    """opt_bot.make_bot routes 2-field specs to vector_bot and 3-field
    specs to ladder_bot; the ladder warm start reproduces nit_ladder."""
    import jax.numpy as jnp

    from montecarlo_tpu.models.bots import _HOLE, ladder_bot
    from montecarlo_tpu.models.policy_net import policy_logits
    from scripts.opt_bot import _LADDER_X0, make_bot, spec_dim

    assert spec_dim((3, 0)) == 21 and spec_dim((3, 1, 0)) == 42
    got = make_bot(_LADDER_X0, (3, 1, 0))
    want = ladder_bot(_HOLE, 1.15, _HOLE, 0.95, top=3, mid=1, bot=0)
    feats = jnp.asarray(
        np.random.default_rng(5).random((7, 20)), jnp.float32)
    assert np.allclose(np.asarray(policy_logits(got, feats)),
                       np.asarray(policy_logits(want, feats)))


def test_cma_noisy_fitness_still_improves():
    rng = np.random.default_rng(0)
    target = np.array([1.0, 2.0, -1.0])
    es = CMAES(np.zeros(3), sigma0=0.8, popsize=20, seed=7)
    for _ in range(150):
        x = es.ask()
        f = -np.sum((x - target[None]) ** 2, axis=1)
        es.tell(f + 0.05 * rng.standard_normal(len(f)))
    assert np.sum((es.mean - target) ** 2) < 0.05
