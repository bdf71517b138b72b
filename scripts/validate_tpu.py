"""On-hardware validation: Pallas kernel vs XLA path statistical agreement.

Run on a real TPU (the CPU test mesh can't execute the TPU PRNG
primitives): both backends estimate the same matchups; their estimates must
agree within combined Monte Carlo error, and known textbook values must be
reproduced. Exits nonzero on failure.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from montecarlo_tpu.cards import make_card  # noqa: E402
from montecarlo_tpu.ops.pallas_equity import equity_vs_hand_pallas  # noqa: E402
from montecarlo_tpu.rollout.equity import equity_vs_hand  # noqa: E402

H, D, S, C = 0, 1, 2, 3

MATCHUPS = [
    ("AKs vs QQ", [make_card(H, 14), make_card(H, 13)],
     [make_card(D, 12), make_card(S, 12)], 0.460),
    ("AA vs KK", [make_card(H, 14), make_card(D, 14)],
     [make_card(H, 13), make_card(D, 13)], 0.820),
    ("72o vs AKo", [make_card(H, 7), make_card(D, 2)],
     [make_card(S, 14), make_card(C, 13)], 0.32),
]

N = 4_000_000


def check_engine_kernel() -> int:
    """Whole-step engine kernel on hardware.

    (a) COMPILED deterministic mode must match the XLA engine bit-exactly
    on injected streams (the CPU suite pins interpret mode; this pins the
    Mosaic lowering). (b) PRNG mode must agree statistically with the XLA
    perpetual engine: steps/hand and mean final stack within tolerance,
    zero overflow latches.
    """
    import numpy as np
    import jax.numpy as jnp

    from montecarlo_tpu.engine.state import TableConfig
    from montecarlo_tpu.ops import pallas_engine as pe
    from tests.test_pallas_engine import (
        CFG, HMAX, N_CARDS, P, _bitmask, _decks_from_cards, _replica,
        _streams,
    )

    failures = 0

    # (a) compiled deterministic mode vs XLA engine, 24 steps x 1024 tables
    actions, cards = _streams(23)
    decks = _decks_from_cards(cards)
    packed = pe.pack_state(CFG, cards[:, 0])
    act_in = jnp.asarray(actions[:24].reshape(24, *pe.TILE)[None])
    cards_in = jnp.asarray(
        cards.transpose(1, 2, 0).reshape(HMAX, N_CARDS, *pe.TILE)[None])
    out = np.asarray(pe.run_perpetual_det(
        packed, act_in, cards_in, P, 24, CFG.small_blind, CFG.big_blind,
        jit=True))
    ref, _, ref_done, _ = _replica(actions, decks, 24)
    clean = np.asarray(pe.unpack_field(jnp.asarray(out), CFG,
                                       "overflow")) == 0

    def col(name, i=0):
        return np.asarray(pe.unpack_field(jnp.asarray(out), CFG, name, i))

    ok = clean.mean() > 0.9
    ok &= np.array_equal(col("hand_ct")[clean],
                         np.asarray(ref_done)[clean])
    ok &= np.array_equal(col("folded")[clean], _bitmask(ref.folded)[clean])
    for k in range(P):
        ok &= np.array_equal(col("stacks", k)[clean],
                             np.asarray(ref.stacks[:, k])[clean])
    failures += 0 if ok else 1
    print(f"engine kernel det-mode (Mosaic) vs XLA engine: "
          f"{int(clean.sum())}/{clean.size} exact [{'ok' if ok else 'FAIL'}]")

    # (a2) FULL-block exactness: a production-raise-density stream (3%,
    # CPU-verified zero overflow for this seed) must match the XLA engine
    # on every one of the 1024 tables — no capacity-latch exclusions.
    from tests.test_pallas_engine import _streams_capacity_safe

    actions, cards = _streams_capacity_safe(41)
    decks = _decks_from_cards(cards)
    packed = pe.pack_state(CFG, cards[:, 0])
    act_in = jnp.asarray(actions[:24].reshape(24, *pe.TILE)[None])
    cards_in = jnp.asarray(
        cards.transpose(1, 2, 0).reshape(HMAX, N_CARDS, *pe.TILE)[None])
    out = np.asarray(pe.run_perpetual_det(
        packed, act_in, cards_in, P, 24, CFG.small_blind, CFG.big_blind,
        jit=True))
    ref, _, ref_done, _ = _replica(actions, decks, 24)
    n_ovf = int(np.sum(np.asarray(
        pe.unpack_field(jnp.asarray(out), CFG, "overflow")) != 0))

    def col2(name, i=0):
        return np.asarray(pe.unpack_field(jnp.asarray(out), CFG, name, i))

    ok = n_ovf == 0
    ok &= np.array_equal(col2("hand_ct"), np.asarray(ref_done))
    ok &= np.array_equal(col2("folded"), _bitmask(ref.folded))
    for k in range(P):
        ok &= np.array_equal(col2("stacks", k), np.asarray(ref.stacks[:, k]))
    failures += 0 if ok else 1
    print(f"engine kernel det-mode full-block: 1024/1024 exact, "
          f"overflow={n_ovf} [{'ok' if ok else 'FAIL'}]")

    # (b) PRNG mode statistics vs the XLA perpetual engine
    from montecarlo_tpu.rollout.selfplay import play_hands_perpetual

    cfg = TableConfig(num_seats=6, max_layers=8, max_pot_layers=16)
    n_tables, n_steps = 1 << 14, 256
    state, hands_k, ovf = pe.selfplay_perpetual_kernel(
        5, cfg, n_tables, n_steps, steps_per_launch=n_steps)
    sph_k = n_tables * n_steps / max(hands_k, 1)
    stacks_k = float(jnp.mean(jnp.stack(
        [pe.unpack_field(state, cfg, "stacks", k).astype(jnp.float32)
         for k in range(6)])))

    keys = jax.random.split(jax.random.key(5), n_tables)
    final, hands_x = play_hands_perpetual(keys, cfg, n_steps)
    sph_x = n_tables * n_steps / max(int(hands_x), 1)
    stacks_x = float(jnp.mean(final.stacks.astype(jnp.float32)))

    # Deferred settlement idles a finished table ~ (DEFER-1)/2 slots per
    # hand before its settle pass, so the kernel's slots/hand carries that
    # known offset over the XLA engine's steps/hand. Raw mean stacks are
    # confounded by the end-of-window hand phase (a deferred run leaves
    # more tables at fresh-hand blinds), so the settlement-accounting
    # check is the in-kernel per-position settled-delta meters against
    # the committed 167.5M-hand artifact (data/position_winrates.json):
    # per-settled-hand quantities, no phase bias.
    defer = pe.DEFER if (pe.DEFER > 1 and n_steps % pe.DEFER == 0) else 1
    sph_expect = sph_x + (defer - 1) / 2
    ok = ovf == 0 and abs(sph_k - sph_expect) / sph_expect < 0.03

    import json as _json
    with open("data/position_winrates.json") as f:
        art = _json.load(f)["reference_rules"]["positions"]
    sums, hands_m2 = pe.position_deltas(state, cfg)
    pos_bb = sums / max(hands_m2, 1) / cfg.big_blind
    worst = 0.0
    for k in range(6):
        worst = max(worst, abs(pos_bb[k] - art[str(k)]["bb_per_hand"]))
    # Tolerance: statistical noise here is ~0.03 bb (126k settled hands),
    # but the 256-slot window truncates ~13% of hands (7.7 hands/table;
    # long hands are likelier to be cut), a selection bias worth ~0.15 bb
    # that the artifact's 160-hand/table window doesn't share. Real
    # accounting bugs are blind-sized (>=0.5 bb); 0.25 separates the two.
    ok &= worst < 0.25
    failures += 0 if ok else 1
    print(f"engine kernel prng vs XLA: slots/hand {sph_k:.2f} vs expected "
          f"{sph_expect:.2f} (XLA {sph_x:.2f} + idle); position deltas vs "
          f"167.5M-hand artifact, worst |diff| {worst:.3f} bb/hand; "
          f"mean stack {stacks_k:.1f} (XLA {stacks_x:.1f}, phase-biased); "
          f"overflow={ovf} [{'ok' if ok else 'FAIL'}]")

    # (c) standard-rules PRNG mode: chips conserve EXACTLY (the standard
    # accounting pays out every contributed chip; busted seats sit out).
    cfg_std = TableConfig(num_seats=6, rules="standard")
    n_t2 = 1 << 13
    state2, hands2, ovf2 = pe.selfplay_perpetual_kernel(
        9, cfg_std, n_t2, 256, steps_per_launch=256)
    total_chips = sum(
        int(jnp.sum(pe.unpack_field(state2, cfg_std, "stacks", k)))
        for k in range(6))
    # stacks are mid-hand here: add back the chips sitting in the current
    # street and pots
    layout_std, _ = pe._field_layout(6, "standard")
    st_arr = jnp.asarray(state2)
    in_play = 0
    for name in ("lvl", "pot_amt"):
        off, rows = layout_std[name]
        if name == "lvl":
            # street chips = sum over seats of contrib
            coff, crows = layout_std["contrib"]
            in_play += int(jnp.sum(st_arr[:, coff:coff + crows]))
        else:
            # pot chips = amt * |contributors| per slot row
            aoff, arows = layout_std["pot_amt"]
            soff, srows = layout_std["pot_set"]
            amt = st_arr[:, aoff:aoff + arows]
            pset = st_arr[:, soff:soff + srows]
            popc = jnp.zeros_like(pset)
            for k in range(6):
                popc = popc + (jnp.right_shift(pset, k) & 1)
            in_play += int(jnp.sum(amt * popc))
    expected = n_t2 * 6 * cfg_std.starting_stack
    ok = (ovf2 == 0 and hands2 > 0
          and total_chips + in_play == expected)
    failures += 0 if ok else 1
    print(f"engine kernel standard rules: {hands2} hands, chips "
          f"{total_chips}+{in_play} vs {expected} exact-conserved, "
          f"overflow={ovf2} [{'ok' if ok else 'FAIL'}]")

    # (c2) tournament rules run TO COMPLETION: every table must freeze
    # with the winner holding every chip — total placements, no
    # unfinished tail (the relaunch wrapper keeps going until 100%).
    cfg_t = TableConfig(num_seats=6, rules="tournament")
    n_t3 = 1 << 13
    state3, steps3 = pe.tournaments_to_completion(13, cfg_t, n_t3,
                                                  steps_per_launch=1024)
    ovf3 = int(jnp.sum(pe.unpack_field(state3, cfg_t, "overflow")))
    stacks3 = np.stack([np.asarray(pe.unpack_field(state3, cfg_t,
                                                   "stacks", k))
                        for k in range(6)])
    frozen = np.asarray(pe.unpack_field(state3, cfg_t, "order")) == 0
    winner_all = stacks3.max(axis=0) == 6 * cfg_t.starting_stack
    places, frozen_r = pe.tournament_results(state3, cfg_t)
    ok = (ovf3 == 0 and bool(frozen.all()) and bool(winner_all.all())
          and bool(np.all(stacks3.sum(axis=0)
                          == 6 * cfg_t.starting_stack))
          and bool(frozen_r.all())
          and places.shape == (n_t3, 6)
          and bool(np.all(np.sort(places, axis=1)
                          == np.arange(1, 7)[None])))
    failures += 0 if ok else 1
    print(f"engine kernel tournament: {n_t3}/{n_t3} complete in {steps3} "
          f"steps, winner-takes-all + exact conservation + total "
          f"placements on every table, overflow={ovf3} "
          f"[{'ok' if ok else 'FAIL'}]")

    # (d) in-kernel policy net: the trained artifact must beat the
    # untrained net at its pinned seat with separated confidence intervals
    # (validates features, MXU logits, and Gumbel sampling end to end).
    from montecarlo_tpu.models.policy_net import init_params, load_params

    cfg_net = TableConfig(num_seats=6, rules="standard")
    try:
        trained = load_params("data/policy_6max_200.npz")
        mt, et, _ = pe.selfplay_net_eval_kernel(
            11, cfg_net, trained, net_seats=1, n_tables=1 << 14,
            n_steps=256)
        mu, eu, _ = pe.selfplay_net_eval_kernel(
            11, cfg_net, init_params(jax.random.key(0)), net_seats=1,
            n_tables=1 << 14, n_steps=256)
        ok = mt[0] - 2 * et[0] > mu[0] + 2 * eu[0] > 0
        failures += 0 if ok else 1
        print(f"in-kernel policy net: trained {mt[0]:+.3f}±{et[0]:.3f} "
              f"bb/hand at seat 0 vs untrained {mu[0]:+.3f}±{eu[0]:.3f} "
              f"[{'ok' if ok else 'FAIL'}]")
    except FileNotFoundError:
        print("in-kernel policy net: artifact missing [skip]")

    # (e) mesh-composed kernel (shard_map + psum around the engine kernel)
    from montecarlo_tpu.parallel.mesh import make_mesh, sharded_selfplay_kernel

    mesh = make_mesh()
    _, hands_m = sharded_selfplay_kernel(mesh, 7, cfg,
                                         blocks_per_device=8, n_steps=256)
    sph_m = (mesh.devices.size * 8 * pe.TABLES_PER_BLOCK * 256
             / max(hands_m, 1))
    # both runs use the deferred kernel: compare slots/hand to the
    # single-device kernel number (same idle accounting)
    ok = abs(sph_m - sph_k) / sph_k < 0.05
    failures += 0 if ok else 1
    print(f"mesh+engine kernel: {hands_m} hands over "
          f"{mesh.devices.size} device(s), steps/hand {sph_m:.2f} "
          f"[{'ok' if ok else 'FAIL'}]")
    return failures


def check_net_kernels() -> int:
    """Population-batched and league variants of the net-eval kernel.

    (a) `run_net_eval_pop` (grid (C, blocks), block-indexed PRNG) must
    reproduce per-candidate `selfplay_net_eval_kernel` launches EXACTLY
    — same streams, so identical meters and hand counts. (b) the league
    kernel with P identical per-seat banks must reproduce the single-net
    kernel with net_seats=all exactly (one-hot bank selection).
    """
    import numpy as np

    from montecarlo_tpu.engine.state import TableConfig
    from montecarlo_tpu.models.policy_net import init_params, load_params
    from montecarlo_tpu.ops.pallas_engine import (
        initial_packed_state, selfplay_net_eval_kernel,
        selfplay_net_eval_pop, selfplay_net_league,
    )

    failures = 0
    cfg = TableConfig(num_seats=6, rules="standard")
    P = cfg.num_seats
    n_t, n_s, seed = 4096, 256, 314
    cands = [load_params("data/policy_6max_200.npz"),
             init_params(jax.random.key(7))]
    state0 = initial_packed_state(seed, cfg, n_t)

    pm, _, ph = selfplay_net_eval_pop(seed, cfg, cands, net_seats=1,
                                      n_tables=n_t, n_steps=n_s,
                                      state0=state0)
    ok = True
    for c, p in enumerate(cands):
        m, _, h = selfplay_net_eval_kernel(seed, cfg, p, net_seats=1,
                                           n_tables=n_t, n_steps=n_s,
                                           state0=state0)
        ok &= bool(np.all(m == pm[c]) and h == ph[c])
    failures += 0 if ok else 1
    print(f"pop kernel vs {len(cands)} single launches: exact meters "
          f"[{'ok' if ok else 'FAIL'}]")

    m1, _, h1 = selfplay_net_eval_kernel(seed, cfg, cands[0],
                                         net_seats=(1 << P) - 1,
                                         n_tables=n_t, n_steps=n_s,
                                         state0=state0)
    m2, _, h2 = selfplay_net_league(seed, cfg, [cands[0], cands[0]],
                                    tuple(k % 2 for k in range(P)),
                                    n_tables=n_t, n_steps=n_s,
                                    state0=state0)
    ok = bool(np.all(m1 == m2) and h1 == h2)
    failures += 0 if ok else 1
    print(f"league kernel (identical banks) vs single net: exact "
          f"[{'ok' if ok else 'FAIL'}]")

    # (c) bank ROUTING with distinct banks (identical banks can't see a
    # wrong-but-one-hot selection): a deterministic always-pot-raise net
    # jams all-in every hand and — all-in players being excluded from
    # showdown, the preserved reference quirk (board.clj:53-60) — loses
    # its stack, so seat 0's sign pins which bank it played. The pop
    # variant must route each candidate's bank-0 likewise.
    #
    # MUST run under rules="reference": the exclusion quirk is what makes
    # the jammer's sign deterministic. Under "standard" all-in seats stay
    # live for showdown (engine/step.py) and every leg is ~EV-neutral —
    # the first on-hardware run of this check (round 4) failed exactly
    # because it inherited the section's standard-rules cfg.
    from montecarlo_tpu.ops.pallas_engine import selfplay_net_league_pop

    rcfg = TableConfig(num_seats=6, rules="reference")
    rstate0 = initial_packed_state(seed, rcfg, n_t)

    def biased(key, action):
        p = init_params(jax.random.key(key))
        b3 = np.zeros(4, np.float32)
        b3[action] = 100.0
        import jax.numpy as jnp
        return p._replace(w3=p.w3 * 0.0, b3=jnp.asarray(b3))

    callbot, raisebot = biased(1, 1), biased(2, 3)
    stb = (0,) + (1,) * (P - 1)
    ma, _, _ = selfplay_net_league(seed, rcfg, [callbot, raisebot], stb,
                                   n_tables=n_t, n_steps=n_s,
                                   state0=rstate0)
    mb, _, _ = selfplay_net_league(seed, rcfg, [raisebot, callbot], stb,
                                   n_tables=n_t, n_steps=n_s,
                                   state0=rstate0)
    mp, _, _ = selfplay_net_league_pop(seed, rcfg, [callbot, raisebot],
                                       raisebot, n_tables=n_t,
                                       n_steps=n_s, seat_to_bank=stb,
                                       state0=rstate0)
    ok = (ma[0] > 0 > mb[0]          # raisebot jams and loses its stack
          and mp[0, 0] > mp[1, 0])   # pop candidate banks route likewise
    failures += 0 if ok else 1
    print(f"league bank routing (call@0 vs raise@0): seat0 "
          f"{ma[0]:+.2f} / {mb[0]:+.2f} bb, pop candidates "
          f"{mp[0, 0]:+.2f} / {mp[1, 0]:+.2f} [{'ok' if ok else 'FAIL'}]")
    return failures


def check_net_det() -> int:
    """Deterministic NET kernel on hardware: compiled Mosaic vs the XLA
    net pipeline on the SAME device. Rule-bot banks (rectified-pair
    constructions survive bf16 matmul-input rounding by design —
    models/bots.py) play argmax on injected deals; trajectories must be
    exact. The CPU suite pins interpret mode == XLA; this pins the
    Mosaic lowering of the banked-MLP det path (dryrun item 7's shape).
    """
    import numpy as np
    import jax.numpy as jnp

    from montecarlo_tpu.models.bots import panel
    from montecarlo_tpu.ops import pallas_engine as pe
    from tests.test_pallas_engine import (
        N_CARDS, P, T, _decks_from_cards, make_cfg,
        xla_net_det_reference,
    )

    cfg = make_cfg("standard")
    rng = np.random.default_rng(97)
    n_steps, hmax = 24, 16
    cards = np.argsort(rng.random((T, hmax, 52)),
                       axis=-1)[..., :N_CARDS].astype(np.int32)
    decks = _decks_from_cards(cards)
    bots = panel()
    banks = [bots["jam_tight"], bots["fof_call"]]
    stb = (0,) + (1,) * (P - 1)
    bots_by_seat = [banks[b] for b in stb]

    packed = pe.pack_state(cfg, cards[:, 0])
    cards_in = jnp.asarray(
        cards.transpose(1, 2, 0).reshape(hmax, N_CARDS, *pe.TILE)[None])
    weights = pe._stack_weights_league(banks)
    out = np.asarray(pe.run_net_det(
        packed, cards_in, weights, P, n_steps, cfg.small_blind,
        cfg.big_blind, cfg.starting_stack, cfg.rules, n_banks=2,
        seat_to_bank=stb, jit=True))

    # the SAME reference driver the CPU suite pins interpret mode against
    ref, ref_done = xla_net_det_reference(cfg, bots_by_seat, decks,
                                          n_steps, hmax)
    clean = np.asarray(pe.unpack_field(jnp.asarray(out), cfg,
                                       "overflow")) == 0

    def col(name, i=0):
        return np.asarray(pe.unpack_field(jnp.asarray(out), cfg, name, i))

    ok = clean.mean() > 0.95
    n_match = int(np.sum((col("hand_ct") == np.asarray(ref_done))
                         & clean))
    ok &= np.array_equal(col("hand_ct")[clean],
                         np.asarray(ref_done)[clean])
    for k in range(P):
        ok &= np.array_equal(col("stacks", k)[clean],
                             np.asarray(ref.stacks[:, k])[clean])
    print(f"net kernel det-mode (Mosaic) vs XLA net pipeline: "
          f"{n_match}/{int(clean.sum())} clean tables exact "
          f"[{'ok' if ok else 'FAIL'}]")
    return 0 if ok else 1


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", choices=["engine", "equity", "net"],
                    default=None,
                    help="run one section (full validate can exceed a "
                         "10-minute window on a cold/degraded tunnel)")
    args = ap.parse_args()

    failures = 0
    if args.only == "net":
        return 1 if (check_net_kernels() + check_net_det()) else 0
    if args.only != "equity":
        failures += check_engine_kernel()
        failures += check_net_kernels()
        failures += check_net_det()
    if args.only == "engine":
        return 1 if failures else 0

    # Fused sweep kernel vs known per-hand equities.
    import jax.numpy as jnp

    from montecarlo_tpu.ops.pallas_equity import equity_sweep_pallas

    heroes = jnp.array([
        [make_card(H, 14), make_card(D, 14)],   # AA ~0.853
        [make_card(H, 7), make_card(D, 2)],     # 72o ~0.347
    ], jnp.int32)
    eq, _ = equity_sweep_pallas(11, heroes, 2_000_000)
    for i, (nm, lo, hi) in enumerate([("AA", 0.84, 0.87), ("72o", 0.30, 0.37)]):
        ok = lo < eq[i] < hi
        failures += 0 if ok else 1
        print(f"sweep {nm:4s} vs random = {eq[i]:.4f} [{'ok' if ok else 'FAIL'}]")
    # Mesh-composed kernel (shard_map + psum around the Pallas kernel; one
    # device here, but the v4-8 deployment shape).
    from montecarlo_tpu.parallel.mesh import make_mesh, sharded_equity_pallas

    mesh = make_mesh()
    r = sharded_equity_pallas(mesh, 29, [make_card(H, 14), make_card(H, 13)],
                              [make_card(D, 12), make_card(S, 12)], 2_000_000)
    ok = abs(r.equity - 0.460) < 0.01
    failures += 0 if ok else 1
    print(f"mesh+kernel  equity={r.equity:.4f} devices={mesh.devices.size} "
          f"[{'ok' if ok else 'FAIL'}]")

    # Partial-board kernel vs the exact enumerator (990 flop completions).
    from montecarlo_tpu.rollout.equity import equity_exact

    fhero = [make_card(H, 14), make_card(H, 13)]
    fvillain = [make_card(D, 12), make_card(S, 12)]
    flop = [make_card(H, 12), make_card(H, 7), make_card(H, 2)]
    exact = equity_exact(fhero, fvillain, board=flop)
    w, t, n = equity_vs_hand_pallas(13, fhero, fvillain, 2_000_000,
                                    board=flop)
    pal = (w + 0.5 * t) / n
    ok = abs(pal - exact.equity) < 0.003
    failures += 0 if ok else 1
    print(f"flop kernel  exact={exact.equity:.4f} pallas={pal:.4f} "
          f"[{'ok' if ok else 'FAIL'}]")

    # Multiway kernel vs XLA multiway path.
    from montecarlo_tpu.ops.pallas_equity import equity_multiway_pallas
    from montecarlo_tpu.rollout.equity import equity_multiway

    trio = [[make_card(H, 14), make_card(D, 14)],
            [make_card(S, 13), make_card(C, 13)],
            [make_card(H, 7), make_card(D, 6)]]
    eq_k, _ = equity_multiway_pallas(17, trio, 2_000_000)
    eq_x, _ = equity_multiway(jax.random.key(18), trio, 2_000_000)
    ok = max(abs(a - b) for a, b in zip(eq_k, eq_x)) < 0.004
    failures += 0 if ok else 1
    print(f"multiway kernel vs xla: {[round(float(x), 4) for x in eq_k]} vs "
          f"{[round(float(x), 4) for x in eq_x]} [{'ok' if ok else 'FAIL'}]")

    for name, hero, villain, approx in MATCHUPS:
        xla = equity_vs_hand(jax.random.key(1), hero, villain, N,
                             batch_size=1 << 20)
        w, t, n = equity_vs_hand_pallas(2, hero, villain, N)
        pal = (w + 0.5 * t) / n
        se = math.sqrt(0.25 / N) * 2  # conservative combined SE
        agree = abs(xla.equity - pal) < 6 * se
        near = abs(pal - approx) < 0.02
        status = "ok" if (agree and near) else "FAIL"
        failures += 0 if (agree and near) else 1
        print(f"{name:12s} xla={xla.equity:.5f} pallas={pal:.5f} "
              f"textbook~{approx:.3f} [{status}]")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
