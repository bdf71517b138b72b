"""Benchmark: Monte Carlo rollout + betting-engine throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The headline metric is equity rollouts/sec (one rollout = deal a random
5-card board from the live deck, rank both 7-card hands with the bitmask
evaluator, compare, reduce — the hot path of the equity API, BASELINE
configs 3/5). The same line also reports ``betting_hands_per_sec``: full
betting hands (blinds -> betting rounds -> showdown -> payout) through the
vmapped engine (``rollout/selfplay.py``), so the two throughput axes are
unambiguous. The reference publishes no numbers (README.md:9 aspires to
"reasonably performant"; BASELINE.json published == {}), so vs_baseline is
measured against the BASELINE.json north-star target of 1e8 rollouts/sec.

Extra diagnostics go to stderr; the stdout contract stays one line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from montecarlo_tpu.cards import make_card  # noqa: E402
from montecarlo_tpu.rollout.equity import _equity_vs_hand_device  # noqa: E402

NORTH_STAR = 1e8  # rollouts/sec on a v4-8 class part (BASELINE.json)


def _run_pallas(hero, villain, n, launches=8):
    """Steady-state: issue ``launches`` kernel launches of ``n`` rollouts
    back-to-back (async dispatch) and pay the host round-trip ONCE at the
    end — through the axon tunnel a sync costs ~0.2 s, which at one launch
    per sync would masquerade as a ~2x kernel slowdown."""
    import numpy as np

    from montecarlo_tpu.ops.pallas_equity import equity_vs_hand_counts

    def once(seed):
        t0 = time.perf_counter()
        parts = [equity_vs_hand_counts(seed + 31 * i, hero, villain, n)
                 for i in range(launches)]
        buf = np.asarray(jnp.concatenate(      # ONE fetch = ONE sync
            [p[0].ravel() for p in parts] + [p[1].ravel() for p in parts]))
        dt = time.perf_counter() - t0
        m = sum(p[2] for p in parts)
        half = buf.shape[0] // 2
        w = sum(int(x) for x in buf[:half])
        t = sum(int(x) for x in buf[half:])
        return dt, w, t, m

    once(0)  # warmup/compile
    best, w, t, m = min(once(i + 1) for i in range(2))
    return best, w, t, m, "pallas"


def _run_xla(hero, villain, n):
    batch, n_chunks = 1 << 21, max(1, n // (1 << 21))
    key = jax.random.key(0)

    def once(k):
        t0 = time.perf_counter()
        w, t = _equity_vs_hand_device(k, hero, villain, batch, n_chunks)
        wt = int(w) + 0  # host round-trip: block_until_ready alone does not
        _ = int(t)       # synchronize through the axon tunnel
        return time.perf_counter() - t0, int(w), int(t), batch * n_chunks

    once(key)
    best, w, t, m = min(once(jax.random.fold_in(key, i)) for i in range(3))
    return best, w, t, m, "xla"


def _run_selfplay_kernel(n_tables=1 << 20, n_steps=512):
    """Full betting hands/sec through the whole-step Pallas engine kernel
    (config 4): perpetual tables entirely in VMEM — policy draw, levels
    bet algebra, street moves, showdown evaluation+payout, and the next
    deal all inside one kernel step (gameplay.clj:122-150). Steady-state:
    the first-deal init is outside the timed region; the overflow latch is
    asserted so the measurement cannot silently drop a side pot."""
    import numpy as np

    from montecarlo_tpu.engine.state import TableConfig
    from montecarlo_tpu.ops.pallas_engine import (
        pack_state,
        run_perpetual_prng,
        unpack_field,
    )

    cfg = TableConfig(num_seats=6)
    P = cfg.num_seats
    keys = jax.random.split(jax.random.key(0), n_tables)
    decks = jax.vmap(lambda k: jax.random.permutation(k, 52))(keys)
    base = 2 * P
    pos = list(range(base)) + [base + 1, base + 2, base + 3, base + 5,
                               base + 7]
    state0 = jax.device_put(pack_state(cfg, np.asarray(decks)[:, pos]))

    def once(seed):
        t0 = time.perf_counter()
        out = run_perpetual_prng(seed, state0, P, n_steps,
                                 cfg.small_blind, cfg.big_blind)
        hands = int(jnp.sum(unpack_field(out, cfg, "hand_ct")))
        dt = time.perf_counter() - t0
        assert hands > 0
        assert int(jnp.sum(unpack_field(out, cfg, "overflow"))) == 0
        return dt, hands

    once(0)  # warmup/compile
    best, hands = min(once(i + 1) for i in range(3))
    return {
        "betting_hands_per_sec": hands / best,
        "betting_rules": cfg.rules,
        "betting_tables": n_tables,
        "betting_steps_per_hand": n_tables * n_steps / hands,
        "betting_ns_per_table_step": best / (n_tables * n_steps) * 1e9,
    }


def _run_sweep169(n_per_hand=10_000_000):
    """BASELINE config 5: 169 canonical hands x 1e7 vs-random rollouts,
    one fused kernel launch — reports the warm wall-clock."""
    from montecarlo_tpu.models.pushfold import canonical_hands
    from montecarlo_tpu.ops.pallas_equity import equity_sweep_pallas

    heroes = jnp.array([list(cards) for _, cards in canonical_hands()],
                       jnp.int32)

    def once(seed):
        t0 = time.perf_counter()
        eq, n = equity_sweep_pallas(seed, heroes, n_per_hand)
        _ = float(eq[0])  # host round-trip = tunnel sync
        return time.perf_counter() - t0, n

    once(5)  # warmup/compile
    best, n = min(once(5 + i) for i in range(2))
    return {"sweep169_seconds_warm": best, "sweep169_rollouts": 169 * n}


def _run_selfplay(n_tables=1 << 20, n_steps=128):
    """Full betting hands/sec through the vmapped XLA engine (the portable
    path; the Pallas whole-step kernel above is ~10x faster on TPU).

    Layer capacities are the measured envelope for 6-max random play
    (L=8/PL=16: zero overflows across 51.7M audited hands; the engine
    latches an overflow flag, asserted below, so the measurement cannot
    silently drop a side pot)."""
    import jax.numpy as jnp

    from montecarlo_tpu.engine.state import TableConfig
    from montecarlo_tpu.rollout.selfplay import play_hands_perpetual

    cfg = TableConfig(num_seats=6, max_layers=8, max_pot_layers=16)

    def once(seed):
        keys = jax.random.split(jax.random.key(seed), n_tables)
        t0 = time.perf_counter()
        final, hands = play_hands_perpetual(keys, cfg, n_steps)
        h = int(hands)  # host round-trip = tunnel sync
        dt = time.perf_counter() - t0
        assert h > 0
        assert int(jnp.sum(final.bets.overflow | final.pots.overflow)) == 0
        return dt, h

    once(0)  # warmup/compile
    best, hands = min(once(i + 1) for i in range(3))
    return hands / best


def _run_net_axis(tables=1 << 18, steps=512, train_tables=1 << 14,
                  train_steps=256, pop=16):
    """The AI-testing axis (VERDICT r3 #3): net-eval hands/s at
    production grid and end-to-end ES-generation training hands/s on the
    population-batched kernel (one launch per generation). Initial-state
    packing stays outside the timed region; meters force the host
    round-trip (tunnel sync)."""
    from montecarlo_tpu.engine.state import TableConfig
    from montecarlo_tpu.models.policy_net import load_params
    from scripts.bench_net_throughput import (
        bench_es_generation, bench_net_eval,
    )

    cfg = TableConfig(num_seats=6, rules="standard")
    params = load_params("data/policy_6max_es3.npz")
    out = {}
    r = bench_net_eval(cfg, params, tables, steps, reps=2)
    out["net_eval_hands_per_sec"] = r["net_eval_hands_per_sec"]
    out["net_eval_tables"] = tables
    r = bench_es_generation(cfg, params, train_tables, train_steps,
                            pop=pop, reps=2)
    out["train_hands_per_sec"] = r["train_hands_per_sec"]
    out["train_pop"] = r["train_pop"]
    return out


def main():
    hero = jnp.array([make_card(0, 14), make_card(0, 13)], jnp.int32)    # AKs
    villain = jnp.array([make_card(1, 12), make_card(2, 12)], jnp.int32)  # QQ
    n = 1 << 30  # ~0.24 s/run hot: large enough to amortize launch overhead

    try:
        best, w, t, m, backend = _run_pallas(hero, villain, n)
    except Exception as e:  # non-TPU backends lack the Mosaic PRNG
        print(f"pallas path unavailable ({type(e).__name__}: {e}); XLA fallback",
              file=sys.stderr)
        best, w, t, m, backend = _run_xla(hero, villain, n)
    n = m

    try:
        betting = _run_selfplay_kernel()
        betting["betting_backend"] = "pallas"
    except Exception as e:  # non-TPU backends lack the Mosaic PRNG
        print(f"kernel selfplay unavailable ({type(e).__name__}: {e}); "
              f"XLA engine fallback", file=sys.stderr)
        try:
            betting = {"betting_hands_per_sec": _run_selfplay(),
                       "betting_backend": "xla", "betting_rules": "reference"}
        except Exception as e2:
            print(f"selfplay bench failed ({type(e2).__name__}: {e2})",
                  file=sys.stderr)
            betting = {"betting_hands_per_sec": None, "betting_backend": None}

    try:
        sweep = _run_sweep169()
    except Exception as e:  # non-TPU: the fused sweep kernel needs Mosaic
        print(f"sweep169 unavailable ({type(e).__name__}: {e})",
              file=sys.stderr)
        sweep = {}

    try:
        net_axis = _run_net_axis()
    except Exception as e:  # non-TPU: the net kernel needs Mosaic PRNG
        print(f"net axis unavailable ({type(e).__name__}: {e})",
              file=sys.stderr)
        net_axis = {}

    rate = n / best
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "backend": backend,
        "rollouts": n,
        "seconds": best,
        "equity_AKs_vs_QQ": (int(w) + 0.5 * int(t)) / n,
    }), file=sys.stderr)
    out = {
        "metric": "equity_rollouts_per_sec",
        "value": rate,
        "unit": "rollouts/s",
        "vs_baseline": rate / NORTH_STAR,
    }
    out.update(betting)
    out.update(sweep)
    out.update(net_axis)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
