"""Checkpoint/resume round-trip (aux subsystem the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.state import TableConfig, init_state
from montecarlo_tpu.rollout.selfplay import play_hands
from montecarlo_tpu.utils.checkpoint import load_states, save_states


def test_checkpoint_roundtrip(tmp_path):
    cfg = TableConfig(num_seats=3)
    keys = jax.random.split(jax.random.key(5), 16)
    states = jax.vmap(lambda k: init_state(k, cfg))(keys)

    path = str(tmp_path / "snap.npz")
    save_states(path, states)
    restored = load_states(path)

    for a, b in zip(jax.tree.leaves(states._replace(key=0)),
                    jax.tree.leaves(restored._replace(key=0))):
        if isinstance(a, int):
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resumed batch continues identically: play a hand from both copies.
    cfg2 = TableConfig(num_seats=3)
    out_a = play_hands(keys, cfg2, num_hands=1)
    save_states(path, out_a)
    out_b = load_states(path)
    np.testing.assert_array_equal(np.asarray(out_a.stacks),
                                  np.asarray(out_b.stacks))
    # PRNG keys survive: dealing the next hand from restored state matches.
    from montecarlo_tpu.engine.state import next_hand

    nxt_a = jax.vmap(next_hand)(out_a)
    nxt_b = jax.vmap(next_hand)(out_b)
    np.testing.assert_array_equal(np.asarray(nxt_a.hole), np.asarray(nxt_b.hole))


def test_ci_width_meter():
    from montecarlo_tpu.cards import make_card
    from montecarlo_tpu.utils.profiling import ci_width_at_wallclock

    res, elapsed = ci_width_at_wallclock(
        jax.random.key(0),
        [make_card(0, 14), make_card(0, 13)],
        [make_card(1, 12), make_card(2, 12)],
        seconds=0.5, batch_size=1 << 14, chunk=4)
    lo, hi = res.ci95
    assert res.n > 0 and lo < res.equity < hi
    assert 0.40 < res.equity < 0.52  # loose: tiny n on CPU


def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from montecarlo_tpu.utils.profiling import device_trace

    with device_trace(str(tmp_path / "trace")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # A trace directory was produced.
    import os as _os

    assert any(True for _ in _os.walk(str(tmp_path / "trace")))
