"""Feature-set v2: betting-history features (street raises / aggressor).

The round-4 leak anatomy (PERF.md) showed every trained artifact leaks
~1.2 bb/hand to simple value-callers because the feature set cannot see
street raise counts or the aggressor — relentless thin value-raising is
locally optimal against stations when aggression is invisible. v2
appends four features (indices 20-23): street_raises/4, facing-a-raiser
flag, raiser relative position, re-raised-street flag.

Back-compat contract: features are only APPENDED; artifacts trained on
the 20-feature set load with zero-padded ``w1`` rows and play
bit-identically (montecarlo_tpu/models/policy_net.py:load_params).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_tpu.engine import TableConfig
from montecarlo_tpu.engine.state import init_state
from montecarlo_tpu.engine.step import head_info, step_action, step_table
from montecarlo_tpu.models.features import NUM_FEATURES, state_features
from montecarlo_tpu.models.policy_net import (
    MLPParams,
    init_params,
    load_params,
    policy_logits,
    save_params,
)

F_STREET_RAISES, F_HAS_AGGR, F_REL_RAISER, F_RERAISED = 20, 21, 22, 23


def _play(st, actions, rules="reference"):
    """Apply a scripted action list, returning the state after each."""
    out = []
    for a in actions:
        st = step_action(st, jnp.asarray(a, jnp.int32), rules=rules)
        out.append(st)
    return st, out


class TestRaiseTracking:
    def test_fresh_hand_no_aggressor(self):
        cfg = TableConfig(num_seats=3)
        st = init_state(jax.random.key(0), cfg)
        assert int(st.street_raises) == 0
        assert int(st.last_raiser) == 3  # P = none
        f = state_features(st)
        assert float(f[F_STREET_RAISES]) == 0.0
        assert float(f[F_HAS_AGGR]) == 0.0
        assert float(f[F_REL_RAISER]) == 0.0
        assert float(f[F_RERAISED]) == 0.0

    def test_raise_sets_counter_and_raiser(self):
        cfg = TableConfig(num_seats=3)
        st = init_state(jax.random.key(0), cfg)
        head0 = int(head_info(st)[0])  # position 2 acts first preflop
        st = step_action(st, jnp.asarray(20, jnp.int32))
        assert int(st.street_raises) == 1
        assert int(st.last_raiser) == head0
        # the next head sees the aggressor features
        head1 = int(head_info(st)[0])
        f = state_features(st)
        assert float(f[F_STREET_RAISES]) == pytest.approx(0.25)
        assert float(f[F_HAS_AGGR]) == 1.0
        assert float(f[F_REL_RAISER]) == pytest.approx(
            ((head0 - head1) % 3) / 3)
        assert float(f[F_RERAISED]) == 0.0

    def test_reraise_flag(self):
        cfg = TableConfig(num_seats=3)
        st = init_state(jax.random.key(0), cfg)
        st = step_action(st, jnp.asarray(20, jnp.int32))   # pos 2 raises
        raiser2 = int(head_info(st)[0])
        st = step_action(st, jnp.asarray(30, jnp.int32))   # pos 0 re-raises
        assert int(st.street_raises) == 2
        assert int(st.last_raiser) == raiser2
        f = state_features(st)
        assert float(f[F_RERAISED]) == 1.0

    def test_calls_and_folds_do_not_count(self):
        cfg = TableConfig(num_seats=3)
        st = init_state(jax.random.key(0), cfg)
        st = step_action(st, jnp.asarray(0, jnp.int32))    # call
        assert int(st.street_raises) == 0
        st = step_action(st, jnp.asarray(-1, jnp.int32))   # fold
        assert int(st.street_raises) == 0
        assert int(st.last_raiser) == 3

    def test_street_transition_resets(self):
        cfg = TableConfig(num_seats=2)
        st = init_state(jax.random.key(0), cfg)
        st = step_action(st, jnp.asarray(10, jnp.int32))   # raise
        assert int(st.street_raises) == 1
        st = step_action(st, jnp.asarray(0, jnp.int32))    # call -> flop
        assert int(st.stage) == 1
        assert int(st.street_raises) == 0
        assert int(st.last_raiser) == 2

    def test_next_hand_resets(self):
        cfg = TableConfig(num_seats=2)
        st = init_state(jax.random.key(3), cfg)
        st = step_table(st, jnp.asarray(10, jnp.int32))    # raise
        st = step_table(st, jnp.asarray(-1, jnp.int32))    # fold -> redeal
        assert int(st.hand_idx) == 1
        assert int(st.street_raises) == 0
        assert int(st.last_raiser) == 2


class TestArtifactBackCompat:
    def test_old_artifact_pads_and_plays_identically(self, tmp_path):
        # Construct a 20-feature-era artifact file by truncating w1.
        params = init_params(jax.random.key(7))
        old = params._replace(w1=params.w1[:20])
        path = str(tmp_path / "old.npz")
        save_params(path, old)
        loaded = load_params(path)
        assert loaded.w1.shape[0] == NUM_FEATURES
        np.testing.assert_array_equal(np.asarray(loaded.w1[20:]), 0.0)
        # Identical logits on real decision states regardless of the new
        # features' values (zero rows contribute nothing).
        cfg = TableConfig(num_seats=3)
        st = init_state(jax.random.key(1), cfg)
        st = step_action(st, jnp.asarray(20, jnp.int32))  # live aggressor
        f = state_features(st)
        got = policy_logits(loaded, f)
        want = old.w1.T @ f[:20]
        want = jnp.maximum(want + old.b1, 0.0)
        want = jnp.maximum(want @ old.w2 + old.b2, 0.0) @ old.w3 + old.b3
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_current_artifact_roundtrip(self, tmp_path):
        params = init_params(jax.random.key(8))
        path = str(tmp_path / "new.npz")
        save_params(path, params)
        loaded = load_params(path)
        for a, b in zip(loaded, params):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_committed_artifacts_upgrade(self):
        # Every shipped artifact must keep loading (zero-padded).
        for name in ("policy_6max_es3.npz", "policy_hu_300.npz"):
            p = load_params(f"data/{name}")
            assert p.w1.shape[0] == NUM_FEATURES

    def test_optbot_vector_padding(self):
        from scripts.opt_bot import make_bot

        # A 20-feature-era attacker vector (len 21) upgrades in place.
        rng = np.random.default_rng(5)
        x_old = rng.normal(size=21).astype(np.float32)
        bot = make_bot(x_old, (3, 0))
        x_new = np.concatenate(
            [x_old[:20], np.zeros(NUM_FEATURES - 20, np.float32),
             x_old[20:]])
        bot2 = make_bot(x_new, (3, 0))
        for a, b in zip(bot, bot2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Ladder triple (two rules) likewise.
        x_old = rng.normal(size=42).astype(np.float32)
        bot = make_bot(x_old, (3, 1, 0))
        half = np.zeros(NUM_FEATURES - 20, np.float32)
        x_new = np.concatenate([x_old[:20], half, x_old[20:21],
                                x_old[21:41], half, x_old[41:]])
        bot2 = make_bot(x_new, (3, 1, 0))
        for a, b in zip(bot, bot2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCheckpointBackCompat:
    def test_old_snapshot_loads_with_defaults(self, tmp_path):
        from montecarlo_tpu.utils.checkpoint import load_states, save_states

        cfg = TableConfig(num_seats=4)
        keys = jax.random.split(jax.random.key(2), 8)
        states = jax.vmap(lambda k: init_state(k, cfg))(keys)
        path = str(tmp_path / "states.npz")
        save_states(path, states)
        # Rewrite the file without the two appended leaves (the pre-v2
        # layout: leaf order is flatten order, new fields are last).
        with np.load(path) as data:
            names = sorted(k for k in data.files if k.startswith("leaf_"))
            keep = {k: data[k] for k in names[:-2]}
            keep["bets_impl"] = data["bets_impl"]
        np.savez(path, **keep)
        loaded = load_states(path)
        np.testing.assert_array_equal(np.asarray(loaded.street_raises),
                                      np.zeros(8, np.int32))
        np.testing.assert_array_equal(np.asarray(loaded.last_raiser),
                                      np.full(8, 4, np.int32))
        np.testing.assert_array_equal(np.asarray(loaded.stacks),
                                      np.asarray(states.stacks))

    def test_roundtrip_with_new_fields(self, tmp_path):
        from montecarlo_tpu.utils.checkpoint import load_states, save_states

        cfg = TableConfig(num_seats=3)
        keys = jax.random.split(jax.random.key(4), 4)
        states = jax.vmap(lambda k: init_state(k, cfg))(keys)
        states = jax.vmap(
            lambda s: step_action(s, jnp.asarray(20, jnp.int32)))(states)
        path = str(tmp_path / "states2.npz")
        save_states(path, states)
        loaded = load_states(path)
        np.testing.assert_array_equal(np.asarray(loaded.street_raises),
                                      np.asarray(states.street_raises))
        np.testing.assert_array_equal(np.asarray(loaded.last_raiser),
                                      np.asarray(states.last_raiser))
