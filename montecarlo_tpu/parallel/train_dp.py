"""Data-parallel REINFORCE over the device mesh.

The scaling recipe for training: replicate the (tiny) policy parameters,
shard the self-play table batch over the ``tables`` mesh axis, compute
local score-function gradients, and ``psum`` them over ICI — the classic
DP layout, with the rollout *generation* itself on-device per shard (no
host in the loop).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from montecarlo_tpu.engine.state import TableConfig, init_state
from montecarlo_tpu.models.policy_net import MLPParams
from montecarlo_tpu.models.train import _play_hand_collect
from montecarlo_tpu.parallel.mesh import AXIS
from montecarlo_tpu.rollout.policy import random_policy

F32 = jnp.float32
I32 = jnp.int32


def make_dp_train_step(
    mesh: Mesh,
    cfg: TableConfig,
    opponent: Callable = random_policy,
    tables_per_device: int = 256,
    lr: float = 3e-3,
    max_steps: int = 48,
):
    """Returns (opt_init, step) where ``step(params, opt_state, key)`` runs
    one advantage-normalized REINFORCE update with gradients psum-reduced
    over the mesh. Params/optimizer state stay replicated."""
    import optax

    opt = optax.adam(lr)
    n_dev = mesh.devices.size
    bb = float(cfg.big_blind)

    def local_rollouts(params: MLPParams, key):
        table_keys = jax.random.split(key, tables_per_device)
        learner_pos = (jnp.arange(tables_per_device) % cfg.num_seats)

        def one(table_key, pos):
            st = init_state(jax.random.fold_in(table_key, 7), cfg)
            return _play_hand_collect(params, st, table_key, pos, opponent,
                                      max_steps, cfg.rules)

        rewards, lps = jax.vmap(one)(table_keys, learner_pos.astype(I32))
        return rewards / bb, lps

    @jax.jit
    def step(params, opt_state, key):
        def shard_fn(params, opt_state, key):
            dev_key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))

            def loss_fn(params):
                rewards_bb, lps = local_rollouts(params, dev_key)
                # Global advantage baseline over all shards.
                g_mean = jax.lax.pmean(jnp.mean(rewards_bb), AXIS)
                g_var = jax.lax.pmean(
                    jnp.mean((rewards_bb - g_mean) ** 2), AXIS)
                adv = (rewards_bb - g_mean) * jax.lax.rsqrt(g_var + 1e-6)
                return -jnp.mean(adv * lps), jnp.mean(rewards_bb)

            (_, local_mean), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g, AXIS) / n_dev, grads)
            updates, opt_state = opt.update(grads, opt_state)
            import optax as _optax

            params = _optax.apply_updates(params, updates)
            mean_r = jax.lax.pmean(local_mean, AXIS)
            return params, opt_state, mean_r

        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P()), out_specs=P(),
            check_vma=False)(params, opt_state, key)

    return opt.init, step
