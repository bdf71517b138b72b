"""Device-mesh sharded rollouts with ICI collectives.

Design (scaling-book recipe): pick a 1D mesh over all chips ("tables" axis),
keep every rollout's state resident on its device, and reduce only the tiny
win/tie counters with ``psum`` — the only bytes that ever cross ICI. The
mesh shape is discovered at runtime, so the same code runs on one chip, a
v4-8 slice, or an 8-device CPU test mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from montecarlo_tpu.engine.state import TableConfig
from montecarlo_tpu.ops.evaluator import eval_masks, suit_masks_from_cards
from montecarlo_tpu.rollout.equity import (
    EquityResult,
    sample_distinct,
    slots_to_cards,
)
from montecarlo_tpu.rollout.selfplay import play_hands

I32 = jnp.int32
AXIS = "tables"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def _local_counts(key, hero_masks, villain_masks, dead, batch, n_chunks):
    """Per-device rollout loop (runs inside shard_map)."""

    def chunk(carry, i):
        w, t = carry
        slots = sample_distinct(jax.random.fold_in(key, i),
                                52 - dead.shape[0], 5, batch)
        board = slots_to_cards(slots, dead)
        bm = suit_masks_from_cards(board)
        vh = eval_masks(*[m | h for m, h in zip(bm, hero_masks)])
        vv = eval_masks(*[m | v for m, v in zip(bm, villain_masks)])
        return (w + jnp.sum((vh > vv).astype(I32)),
                t + jnp.sum((vh == vv).astype(I32))), None

    (w, t), _ = jax.lax.scan(
        chunk, (jnp.zeros((), I32), jnp.zeros((), I32)), jnp.arange(n_chunks))
    return w, t


def sharded_equity_vs_hand(
    mesh: Mesh,
    key,
    hero,
    villain,
    n_rollouts: int,
    per_device_batch: int = 1 << 19,
) -> EquityResult:
    """Hand-vs-hand equity with rollouts sharded over the mesh and the
    win/tie counters psum-reduced over ICI (BASELINE config 5's machinery)."""
    n_dev = mesh.devices.size
    hero = jnp.asarray(hero, I32)
    villain = jnp.asarray(villain, I32)
    batch = min(per_device_batch, max(1, n_rollouts // n_dev))
    n_chunks = -(-n_rollouts // (batch * n_dev))

    @partial(jax.jit, static_argnames=("batch", "n_chunks"))
    def run(key, hero, villain, batch, n_chunks):
        dead = jnp.sort(jnp.concatenate([hero, villain]))
        hm = suit_masks_from_cards(hero)
        vm = suit_masks_from_cards(villain)

        def shard_fn(key):
            dev_key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
            w, t = _local_counts(dev_key, hm, vm, dead, batch, n_chunks)
            return (jax.lax.psum(w, AXIS), jax.lax.psum(t, AXIS))

        return jax.shard_map(
            shard_fn, mesh=mesh, in_specs=P(), out_specs=P(),
            check_vma=False)(key)

    w, t = run(key, hero, villain, batch, n_chunks)
    n = batch * n_chunks * n_dev
    w, t = int(w), int(t)
    return EquityResult(wins=w, ties=t, losses=n - w - t, n=n)


def equity_sweep(
    mesh: Mesh,
    key,
    heroes,
    n_rollouts_per_hand: int,
    per_device_batch: int = 1 << 14,
):
    """Equity-vs-random for a batch of hero hands (e.g. the 169 canonical
    starting hands) — every device rolls its share for *all* hands; the
    [H] win/tie counters psum over ICI. Returns (equity[H], n_per_hand).
    """
    heroes = jnp.asarray(heroes, I32)  # [Hh, 2]
    n_dev = mesh.devices.size
    batch = min(per_device_batch, max(1, n_rollouts_per_hand // n_dev))
    n_chunks = -(-n_rollouts_per_hand // (batch * n_dev))

    @partial(jax.jit, static_argnames=("batch", "n_chunks"))
    def run(key, heroes, batch, n_chunks):
        def one_hero(hkey, hero):
            dead = jnp.sort(hero)
            hm = suit_masks_from_cards(hero)

            def chunk(carry, i):
                w, t = carry
                slots = sample_distinct(jax.random.fold_in(hkey, i),
                                        50, 7, batch)
                cards = slots_to_cards(slots, dead)
                villain, board = cards[:, :2], cards[:, 2:]
                bm = suit_masks_from_cards(board)
                vh = eval_masks(*[m | h for m, h in zip(bm, hm)])
                vv = eval_masks(*[m | v
                                  for m, v in zip(bm, suit_masks_from_cards(villain))])
                return (w + jnp.sum((vh > vv).astype(I32)),
                        t + jnp.sum((vh == vv).astype(I32))), None

            (w, t), _ = jax.lax.scan(
                chunk, (jnp.zeros((), I32), jnp.zeros((), I32)),
                jnp.arange(n_chunks))
            return w, t

        def shard_fn(key, heroes):
            dev_key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
            hkeys = jax.random.split(dev_key, heroes.shape[0])
            w, t = jax.vmap(one_hero)(hkeys, heroes)
            return (jax.lax.psum(w, AXIS), jax.lax.psum(t, AXIS))

        return jax.shard_map(
            shard_fn, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            check_vma=False)(key, heroes)

    w, t = run(key, heroes, batch, n_chunks)
    n = batch * n_chunks * n_dev
    eq = (np.asarray(w) + 0.5 * np.asarray(t)) / n
    return eq, n


def sharded_equity_pallas(
    mesh: Mesh,
    seed: int,
    hero,
    villain,
    n_rollouts: int,
    board=(),
) -> EquityResult:
    """The headline fused Pallas kernel composed with the mesh: each device
    runs its share of kernel programs (distinct PRNG streams via the axis
    index), and the two int32 counters psum over ICI. This is the v4-8
    deployment shape of the north-star metric; on one chip it degenerates
    to the single-kernel path. TPU-only (hardware PRNG primitives).
    """
    from montecarlo_tpu.ops.evaluator import suit_masks_from_cards
    from montecarlo_tpu.ops.pallas_equity import TILE_N, equity_counts_pallas

    n_dev = mesh.devices.size
    hero = jnp.asarray(hero, I32)
    villain = jnp.asarray(villain, I32)
    board = jnp.asarray(board, I32).reshape(-1)
    dead = jnp.sort(jnp.concatenate([hero, villain, board]))
    bmask = (suit_masks_from_cards(board) if board.shape[0]
             else [jnp.zeros((), I32)] * 4)
    hm = jnp.stack([m | b for m, b in
                    zip(suit_masks_from_cards(hero), bmask)])
    vm = jnp.stack([m | b for m, b in
                    zip(suit_masks_from_cards(villain), bmask)])
    programs_per_dev = max(1, -(-n_rollouts // (TILE_N * n_dev)))

    @jax.jit
    def run(seed, dead, hm, vm):
        def shard_fn(seed, dead, hm, vm):
            dev_seed = seed[0] + jax.lax.axis_index(AXIS) * I32(0x9E3779)
            w, t = equity_counts_pallas(dev_seed, dead, hm, vm,
                                        programs_per_dev)
            return (jax.lax.psum(w, AXIS), jax.lax.psum(t, AXIS))

        return jax.shard_map(shard_fn, mesh=mesh,
                             in_specs=(P(), P(), P(), P()), out_specs=P(),
                             check_vma=False)(seed, dead, hm, vm)

    w, t = run(jnp.asarray([seed], I32), dead, hm, vm)
    n = programs_per_dev * TILE_N * n_dev
    w, t = int(w), int(t)
    return EquityResult(wins=w, ties=t, losses=n - w - t, n=n)


def sharded_selfplay(
    mesh: Mesh,
    key,
    cfg: TableConfig,
    tables_per_device: int = 1 << 12,
    num_hands: int = 1,
):
    """Random-policy self-play with the tables axis sharded over the mesh
    (BASELINE config 4 at scale). Pure data parallelism: per-table state
    stays device-resident; jit + sharded inputs let XLA place the batch."""
    n_dev = mesh.devices.size
    n_tables = n_dev * tables_per_device
    keys = jax.random.split(key, n_tables)
    sharding = NamedSharding(mesh, P(AXIS))
    keys = jax.device_put(keys, sharding)
    return play_hands(keys, cfg, num_hands=num_hands)


def sharded_selfplay_perpetual(
    mesh: Mesh,
    key,
    cfg: TableConfig,
    tables_per_device: int = 1 << 12,
    n_steps: int = 64,
):
    """Steady-state perpetual tables sharded over the mesh: the production
    throughput shape (config 4 at scale). Returns (final_states,
    total_hands) with the hand count psum-free (the final reduction is a
    plain sum over the sharded hand_idx field, which XLA lowers to an
    all-reduce over ICI).
    """
    from montecarlo_tpu.rollout.selfplay import play_hands_perpetual

    n_dev = mesh.devices.size
    keys = jax.random.split(key, n_dev * tables_per_device)
    keys = jax.device_put(keys, NamedSharding(mesh, P(AXIS)))
    return play_hands_perpetual(keys, cfg, n_steps)


def sharded_tournaments(
    mesh: Mesh,
    key,
    cfg: TableConfig,
    tables_per_device: int = 1 << 10,
    max_hands: int = 64,
):
    """Tournaments sharded over the mesh; returns (final, busted_at,
    seat_stacks) exactly like ``play_tournament`` with the tables axis
    distributed."""
    from montecarlo_tpu.rollout.selfplay import play_tournament

    n_dev = mesh.devices.size
    keys = jax.random.split(key, n_dev * tables_per_device)
    keys = jax.device_put(keys, NamedSharding(mesh, P(AXIS)))
    return play_tournament(keys, cfg, max_hands)


def sharded_selfplay_kernel(
    mesh: Mesh,
    seed: int,
    cfg: TableConfig,
    blocks_per_device: int = 64,
    n_steps: int = 256,
):
    """The whole-step engine kernel composed with the mesh: each device
    runs its share of table blocks (distinct hardware-PRNG streams via the
    axis index) and the completed-hand counter psum-reduces over ICI — the
    v4-8 deployment shape of the betting-hands metric. TPU-only (the
    Mosaic PRNG primitives do not run on CPU); on one chip it degenerates
    to the single-kernel path. Returns (final_packed_state, total_hands).
    """
    import numpy as np

    from montecarlo_tpu.ops.pallas_engine import (
        TABLES_PER_BLOCK,
        _field_layout,
        pack_state,
        run_perpetual_prng,
    )

    n_dev = mesh.devices.size
    n_tables = n_dev * blocks_per_device * TABLES_PER_BLOCK
    seats = cfg.num_seats
    layout, _ = _field_layout(seats, cfg.rules)
    hand_ct_row = layout["hand_ct"][0]

    keys = jax.random.split(jax.random.key(seed), n_tables)
    decks = jax.vmap(lambda k: jax.random.permutation(k, 52))(keys)
    base = 2 * seats
    pos = list(range(base)) + [base + 1, base + 2, base + 3, base + 5,
                               base + 7]
    state0 = pack_state(cfg, np.asarray(decks)[:, pos])
    state0 = jax.device_put(state0, NamedSharding(mesh, P(AXIS)))

    @jax.jit
    def run(seed_arr, state):
        def shard_fn(seed_arr, state):
            dev_seed = seed_arr[0] + jax.lax.axis_index(AXIS) * I32(7919)
            out = run_perpetual_prng(dev_seed, state, seats, n_steps,
                                     cfg.small_blind, cfg.big_blind,
                                     rules=cfg.rules)
            hands = jnp.sum(out[:, hand_ct_row])
            return out, jax.lax.psum(hands, AXIS)

        return jax.shard_map(shard_fn, mesh=mesh,
                             in_specs=(P(), P(AXIS)),
                             out_specs=(P(AXIS), P()),
                             check_vma=False)(seed_arr, state)

    final, hands = run(jnp.asarray([seed], I32), state0)
    return final, int(hands)


def sharded_selfplay_kernel_det(
    mesh: Mesh,
    cfg: TableConfig,
    state,
    actions,
    cards,
    n_steps: int,
    interpret: bool = False,
):
    """Deterministic-mode engine kernel composed with the mesh: table
    blocks, injected action streams, and per-hand deal stashes all shard
    over the tables axis; the completed-hand counter psum-reduces over it.

    Unlike ``sharded_selfplay_kernel`` this needs no hardware PRNG, so
    with ``interpret=True`` it executes on the 8-device virtual CPU mesh —
    the multi-device coverage of the kernel deployment shape
    (dryrun_multichip item 6, tests/test_parallel.py). Runs eagerly (an
    eager shard_map dispatches the interpreter per-op; jitting the inlined
    interpreter program is minutes of XLA:CPU compile).

    Returns (final packed state [n_blocks, F, 8, 128], total hands)."""
    from montecarlo_tpu.ops.pallas_engine import (
        _field_layout,
        run_perpetual_det,
    )

    layout, _ = _field_layout(cfg.num_seats, cfg.rules)
    hand_ct_row = layout["hand_ct"][0]

    def shard_fn(state, actions, cards):
        out = run_perpetual_det(state, actions, cards, cfg.num_seats,
                                n_steps, cfg.small_blind, cfg.big_blind,
                                rules=cfg.rules, interpret=interpret)
        hands = jnp.sum(out[:, hand_ct_row])
        return out, jax.lax.psum(hands, AXIS)

    shard = NamedSharding(mesh, P(AXIS))
    state = jax.device_put(jnp.asarray(state, I32), shard)
    actions = jax.device_put(jnp.asarray(actions, I32), shard)
    cards = jax.device_put(jnp.asarray(cards, I32), shard)
    out, hands = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P()),
        check_vma=False)(state, actions, cards)
    return out, int(hands)


def sharded_net_kernel_det(
    mesh: Mesh,
    cfg: TableConfig,
    state,
    cards,
    weights,
    n_steps: int,
    n_banks=None,
    seat_to_bank=None,
    interpret: bool = False,
):
    """Deterministic NET/league kernel over the mesh: table blocks and
    deal stashes shard over the tables axis, the banked net weights
    replicate to every device, and the completed-hand counter
    psum-reduces — the multi-device form of the ES/league evaluation
    shape (every seat plays a net, argmax selection, injected deals).

    Zero PRNG, so ``interpret=True`` executes on the 8-device virtual
    CPU mesh (dryrun_multichip item 7); per-device trajectory equality
    with the single-device kernel and the XLA net pipeline is pinned in
    tests/test_parallel.py. Runs eagerly like
    ``sharded_selfplay_kernel_det`` (jitting the inlined interpreter
    program is minutes of XLA:CPU compile).

    Returns (final packed state [n_blocks, F, 8, 128], total hands)."""
    from montecarlo_tpu.ops.pallas_engine import (
        _field_layout,
        run_net_det,
    )

    layout, _ = _field_layout(cfg.num_seats, cfg.rules)
    hand_ct_row = layout["hand_ct"][0]

    def shard_fn(state, cards, *weights):
        out = run_net_det(state, cards, weights, cfg.num_seats, n_steps,
                          cfg.small_blind, cfg.big_blind,
                          cfg.starting_stack, cfg.rules, n_banks=n_banks,
                          seat_to_bank=seat_to_bank, interpret=interpret)
        hands = jnp.sum(out[:, hand_ct_row])
        return out, jax.lax.psum(hands, AXIS)

    shard = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    state = jax.device_put(jnp.asarray(state, I32), shard)
    cards = jax.device_put(jnp.asarray(cards, I32), shard)
    weights = tuple(jax.device_put(jnp.asarray(w), rep) for w in weights)
    out, hands = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)) + (P(),) * len(weights),
        out_specs=(P(AXIS), P()),
        check_vma=False)(state, cards, *weights)
    return out, int(hands)
