"""Table-state snapshots (checkpoint / resume).

The reference loses everything on restart (all state lives in in-memory STM
refs, ``database.clj:5-6``). Here a table batch is a flat array pytree, so a
snapshot is a single ``.npz``: every leaf (PRNG keys included, via
``jax.random.key_data``) round-trips losslessly, and a resumed batch
continues bit-identically — rollouts are deterministic functions of
(key, hand_idx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.state import TableState


def save_states(path: str, states: TableState) -> None:
    from montecarlo_tpu.engine.street import Street

    leaves = states._replace(key=jax.random.key_data(states.key))
    flat, _ = jax.tree.flatten(leaves)
    impl = "levels" if isinstance(states.bets, Street) else "layers"
    np.savez_compressed(
        path, bets_impl=np.asarray(impl),
        **{f"leaf_{i:04d}": np.asarray(x) for i, x in enumerate(flat)})


def load_states(path: str) -> TableState:
    with np.load(path) as data:
        impl = str(data["bets_impl"]) if "bets_impl" in data.files \
            else "layers"
        flat = [data[k] for k in sorted(data.files) if k.startswith("leaf_")]
    # Rebuild against the TableState treedef (the street bet state nests
    # inside; shapes come from the stored leaves, the template only carries
    # structure — which differs between the two bets implementations).
    from montecarlo_tpu.engine.bets import empty_layers
    from montecarlo_tpu.engine.street import make_empty_bets

    template = TableState(
        key=0, hand_idx=0, deck=0, hole=0, community=0, n_community=0,
        stage=0, time=0, button=0, cursor=0, in_hand=0, all_in=0,
        folded=0,
        order_mask=0, to_act=0, stacks=0,
        bets=make_empty_bets(impl, 1, 1), pots=empty_layers(1, 1),
        small_blind=0, big_blind=0, hand_over=0,
        street_raises=0, last_raiser=0)
    treedef = jax.tree.structure(template)
    n_leaves = treedef.num_leaves
    if len(flat) == n_leaves - 2:
        # Snapshot predates the street_raises/last_raiser fields (appended
        # at the end of TableState, so the old leaf prefix is unchanged).
        # Defaults: no raise this street — P (= "none") for last_raiser.
        batch = flat[0].shape[:-1]  # key leaf is [..., 2] u32 key data
        P = flat[3].shape[-2]       # hole leaf is [..., P, 2]
        flat = flat + [np.zeros(batch, np.int32),
                       np.full(batch, P, np.int32)]
    states = jax.tree.unflatten(treedef, [jnp.asarray(x) for x in flat])
    return states._replace(key=jax.random.wrap_key_data(states.key))
