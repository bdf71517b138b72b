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

    from montecarlo_tpu.models.features import NUM_FEATURES

    assert spec_dim((3, 0)) == NUM_FEATURES + 1
    assert spec_dim((3, 1, 0)) == 2 * (NUM_FEATURES + 1)
    got = make_bot(_LADDER_X0, (3, 1, 0))
    want = ladder_bot(_HOLE, 1.15, _HOLE, 0.95, top=3, mid=1, bot=0)
    feats = jnp.asarray(
        np.random.default_rng(5).random((64, NUM_FEATURES)), jnp.float32)
    # make_bot normalizes (score, t) into the bf16-safe range — the
    # scaling preserves every decision, not the raw logits
    assert np.array_equal(
        np.argmax(np.asarray(policy_logits(got, feats)), axis=-1),
        np.argmax(np.asarray(policy_logits(want, feats)), axis=-1))


def test_opt_bot_norm_rule_keeps_decisions_in_safe_range():
    """Extreme CMA weights are scaled into ladder_bot's guarded range
    and the three-way decision boundary is preserved."""
    from montecarlo_tpu.models.features import NUM_FEATURES
    from montecarlo_tpu.models.policy_net import policy_logits
    from scripts.opt_bot import _norm_rule, make_bot, spec_dim

    rng = np.random.default_rng(9)
    nf = NUM_FEATURES
    x = rng.uniform(-3, 3, spec_dim((3, 1, 0)))  # worst corner, CMA box
    b = make_bot(x, (3, 1, 0))  # must not trip the safe-range assert
    v, t = _norm_rule(x[:nf], float(x[nf]))
    assert 2.0 * np.abs(v).sum() + abs(t) <= 4.0 + 1e-6
    # joint scaling preserves the rule: sign(v.f - t) matches pre-norm
    f = rng.random((256, nf))
    pre = f @ x[:nf] - x[nf]
    post = f @ v - t
    assert np.array_equal(pre > 0, post > 0)
    # and the packed net plays a valid three-way policy on those feats
    import jax.numpy as jnp
    lg = np.asarray(policy_logits(b, jnp.asarray(f, jnp.float32)))
    assert set(np.unique(np.argmax(lg, axis=-1))) <= {0, 1, 3}


def test_cma_noisy_fitness_still_improves():
    rng = np.random.default_rng(0)
    target = np.array([1.0, 2.0, -1.0])
    es = CMAES(np.zeros(3), sigma0=0.8, popsize=20, seed=7)
    for _ in range(150):
        x = es.ask()
        f = -np.sum((x - target[None]) ** 2, axis=1)
        es.tell(f + 0.05 * rng.standard_normal(len(f)))
    assert np.sum((es.mean - target) ** 2) < 0.05


def test_resolve_opponent_optbot_spec(tmp_path):
    """train_es_kernel's 'optbot:' pool spec rebuilds the CMA attacker
    from an opt_bot JSON (best_pair default, explicit dash pair, @lone
    geometry) — the probe->retrain loop trains against the discovered
    bot directly."""
    import json

    import jax.numpy as jnp

    from montecarlo_tpu.models.policy_net import policy_logits
    from scripts.opt_bot import make_bot, spec_dim
    from scripts.train_es_kernel import resolve_opponent

    rng = np.random.default_rng(3)
    x_pair = rng.uniform(-1, 1, spec_dim((3, 0))).round(4)
    x_trip = rng.uniform(-1, 1, spec_dim((3, 1, 0))).round(4)
    doc = {"subjects": {"es4": {
        "artifact": "data/policy_6max_es4.npz",
        "best_pair": "3:1:0",
        "per_pair": {"3:0": {"x": list(x_pair)},
                     "3:1:0": {"x": list(x_trip)}}}}}
    path = tmp_path / "opt.json"
    path.write_text(json.dumps(doc))

    from montecarlo_tpu.models.features import NUM_FEATURES

    feats = jnp.asarray(rng.random((32, NUM_FEATURES)), jnp.float32)

    def acts_of(params):
        return np.argmax(np.asarray(policy_logits(params, feats)), axis=-1)

    tag, params, geom = resolve_opponent(f"optbot:{path}:es4")
    assert geom == "five"
    assert np.array_equal(acts_of(params),
                          acts_of(make_bot(x_trip, (3, 1, 0))))

    tag, params, geom = resolve_opponent(f"optbot:{path}:es4:3-0@lone")
    assert geom == "lone"
    assert np.array_equal(acts_of(params),
                          acts_of(make_bot(x_pair, (3, 0))))

    tag, params, geom = resolve_opponent("random@lone")
    assert params is None and geom == "lone"
