"""Decompose the perpetual-table step cost on hardware.

Times vmapped scans whose bodies are (a) policy+step_action only, (b) plus
settle_showdown, (c) plus next_hand, (d) the real step_table — each extra
piece guarded by a data-dependent always-false select so XLA cannot DCE it.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial  # noqa: E402

from montecarlo_tpu.engine.state import (  # noqa: E402
    TableConfig, init_state, next_hand,
)
from montecarlo_tpu.engine.step import (  # noqa: E402
    _select_tree, clamp_action, settle_showdown, step_action, step_table,
)
from montecarlo_tpu.rollout.policy import random_policy  # noqa: E402

I32 = jnp.int32


def _ablate(which):
    """Timing-only ablation: stub one engine sub-op (WRONG semantics)."""
    import montecarlo_tpu.engine.bets as bets_mod
    import montecarlo_tpu.engine.step as step_mod

    saved = {}
    if which == "no_merge":
        saved["merge"] = step_mod.merge_bets
        step_mod.merge_bets = lambda layers: layers
    elif which == "no_update":
        saved["update"] = step_mod.update_bets
        step_mod.update_bets = lambda layers, amt, seat: layers
    elif which == "no_append":
        saved["append"] = step_mod.append_layers
        step_mod.append_layers = lambda dst, src: dst
    elif which == "no_stage":
        saved["stage"] = step_mod.stage_transition
        step_mod.stage_transition = lambda st, rules="reference": st
    return saved


def _restore(saved):
    import montecarlo_tpu.engine.step as step_mod

    for k, v in saved.items():
        if k == "merge":
            step_mod.merge_bets = v
        elif k == "update":
            step_mod.update_bets = v
        elif k == "append":
            step_mod.append_layers = v
        elif k == "stage":
            step_mod.stage_transition = v


def make_scan(kind, cfg, n_steps):
    @partial(jax.jit, static_argnames=())
    def run(keys):
        def one(key):
            st = init_state(key, cfg)

            def body(carry, k):
                st, sr = carry
                if kind == "const_action":  # engine only, no policy RNG
                    action = clamp_action(st, jnp.zeros((), I32))
                else:
                    action = clamp_action(st, random_policy(k, st, sr))
                if kind == "policy_only":   # policy RNG only, no engine
                    nxt = st._replace(time=st.time + (action >= -1))
                elif kind == "carry_only":  # full state carried, ~no math:
                    # every field gets a data dependency so nothing is DCE'd
                    bump = (action >= -1).astype(I32)

                    def touch(x):
                        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                            return x
                        if x.dtype == jnp.bool_:
                            return x ^ (bump > 1)
                        return x + bump.astype(x.dtype)

                    nxt = jax.tree.map(touch, st)
                else:
                    nxt = step_action(st, action, rules=cfg.rules)
                never = nxt.time < 0  # data-dependent, always false
                if kind in ("settle", "both"):
                    nxt = _select_tree(
                        never, settle_showdown(nxt, rules=cfg.rules), nxt)
                if kind in ("deal", "both"):
                    nxt = _select_tree(
                        never, next_hand(nxt, rules=cfg.rules), nxt)
                if kind == "table":
                    nxt = step_table(st, action, rules=cfg.rules)
                sr = jnp.where(nxt.stage != st.stage, 0,
                               sr + ((action > 0) & ~st.hand_over))
                return (nxt, sr), None

            ks = jax.random.split(jax.random.fold_in(key, 3), n_steps)
            (final, _), _ = jax.lax.scan(body, (st, jnp.zeros((), I32)), ks)
            return final

        return jax.vmap(one)(keys)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--kinds", type=str,
                    default="base,settle,deal,both,table")
    ap.add_argument("--prng", type=str, default="")
    ap.add_argument("--L", type=int, default=12)
    ap.add_argument("--PL", type=int, default=24)
    args = ap.parse_args()
    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)
        print(f"prng_impl: {args.prng}", flush=True)
    cfg = TableConfig(num_seats=6, max_layers=args.L,
                      max_pot_layers=args.PL)
    print(f"L={args.L} PL={args.PL}", flush=True)

    for kind in args.kinds.split(","):
        ablation = kind if kind.startswith("no_") else None
        saved = _ablate(ablation) if ablation else {}
        base_kind = "base" if ablation else kind
        jax.clear_caches()  # patched globals must re-trace
        run = make_scan(base_kind, cfg, args.steps)

        def once(seed):
            keys = jax.random.split(jax.random.key(seed), args.tables)
            t0 = time.perf_counter()
            final = run(keys)
            _ = int(final.time.sum())
            return time.perf_counter() - t0

        try:
            once(0)
            dt = min(once(i + 1) for i in range(3))
        finally:
            _restore(saved)
        rate = args.tables * args.steps / dt
        print(json.dumps({
            "kind": kind,
            "table_steps_per_sec": rate,
            "ns_per_table_step": 1e9 / rate * 1,
            "seconds": dt,
        }), flush=True)


if __name__ == "__main__":
    main()
