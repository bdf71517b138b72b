"""Fold-preservation leash (models/leash.py) — the es9 machinery.

Certificates:
- ``anchor_log_pfold``'s host-side NumPy forward is the SAME function
  as the jittable ``policy_logits`` + log-softmax (action 0 = fold):
  the leash scores exactly what the kernel will play.
- The clip floor bounds a buried fold logit at CLIP_LOG_P, so one
  defected state cannot dominate the anchor mean.
- Fitness shaping flips the ES selection the way es9's training run
  relied on: a higher-bb candidate that buried its fold logit loses to
  a slightly-lower-bb candidate that kept it, at the shipped
  lambda=0.25 (PERF.md "es9: the leash holds").
"""

import numpy as np

import jax
import jax.numpy as jnp

from montecarlo_tpu.models.features import NUM_FEATURES
from montecarlo_tpu.models.leash import (
    CLIP_LOG_P, anchor_log_pfold, load_anchor, make_anchor_score,
)
from montecarlo_tpu.models.policy_net import (
    MLPParams, init_params, policy_logits,
)


def _random_feats(key, n):
    return np.asarray(
        jax.random.normal(key, (n, NUM_FEATURES), jnp.float32))


def test_matches_policy_logits_log_softmax():
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = init_params(k1)
    feats = _random_feats(k2, 257)

    got = anchor_log_pfold(params, feats)

    lg = policy_logits(params, jnp.asarray(feats))
    logp_fold = jax.nn.log_softmax(lg, axis=-1)[:, 0]
    want = float(jnp.maximum(logp_fold, CLIP_LOG_P).mean())

    assert abs(got - want) < 1e-5


def _bias_only_params(b3):
    """Zero-weight net whose logits are exactly b3 at every state."""
    hidden = 8
    z = np.zeros
    return MLPParams(
        w1=z((NUM_FEATURES, hidden), np.float32),
        b1=z((hidden,), np.float32),
        w2=z((hidden, hidden), np.float32),
        b2=z((hidden,), np.float32),
        w3=z((hidden, 4), np.float32),
        b3=np.asarray(b3, np.float32),
    )


def test_clip_floor_on_buried_fold_logit():
    feats = _random_feats(jax.random.PRNGKey(3), 64)
    buried = _bias_only_params([-100.0, 0.0, 0.0, 0.0])
    assert anchor_log_pfold(buried, feats) == CLIP_LOG_P

    # an always-fold net scores ~log(1) = 0
    certain = _bias_only_params([100.0, 0.0, 0.0, 0.0])
    assert anchor_log_pfold(certain, feats) > -1e-3


def test_leashed_fitness_flips_selection():
    feats = _random_feats(jax.random.PRNGKey(5), 64)
    lam = 0.25  # the shipped es9 lambda

    # never-fold defector: wins +1.13 bb (the plateau) but pays the
    # full clip penalty; folder: 0.0 bb, near-zero penalty
    defector_bb = 1.13
    folder_bb = 0.0
    defector = _bias_only_params([-50.0, 1.0, 0.0, 0.0])
    folder = _bias_only_params([2.0, 0.0, 0.0, 0.0])

    defector_fit = defector_bb + lam * anchor_log_pfold(defector, feats)
    folder_fit = folder_bb + lam * anchor_log_pfold(folder, feats)

    # unshaped fitness prefers the defector; the leash flips it
    assert defector_bb > folder_bb
    assert folder_fit > defector_fit
    # and the defection cost is the ~2 bb the PERF chapter quotes
    assert lam * -CLIP_LOG_P == 2.0


def test_make_anchor_score_roundtrip(tmp_path):
    feats = _random_feats(jax.random.PRNGKey(11), 32)
    path = tmp_path / "anchor.npz"
    np.savez(path, feats=feats, p_fold_ref=np.full((32,), 0.9))

    loaded = load_anchor(str(path))
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, feats, rtol=0, atol=0)

    score, feats_out = make_anchor_score(str(path))
    params = init_params(jax.random.PRNGKey(12))
    assert score(params) == anchor_log_pfold(params, feats)
    assert feats_out.shape == (32, NUM_FEATURES)
