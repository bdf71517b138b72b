"""A/B kernel experiments: isolate the cost of sampler/eval choices.

Monkeypatches pallas_equity internals per variant, recompiles, times
equity_vs_hand_pallas on the real chip. Scratch tool for tuning — not part
of the driver contract.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from montecarlo_tpu.cards import make_card  # noqa: E402
from montecarlo_tpu.ops import evaluator, pallas_equity as pe  # noqa: E402

I32 = jnp.int32


def sampler_one_word_mod(shape, bounds):
    """Round-1 sampler: one word per draw, plain mod (bias ~1.1e-8)."""
    out = []
    for b in bounds:
        bits = pltpu.prng_random_bits(shape)
        out.append((bits.astype(jnp.uint32) % jnp.uint32(b)).astype(I32))
    return out


def sampler_two_per_word_noreject(shape, bounds):
    """2 draws/word, no rejection (2nd-draw bias ~5e-7)."""
    out = []
    for i in range(0, len(bounds), 2):
        pair = bounds[i:i + 2]
        x = pltpu.prng_random_bits(shape).astype(jnp.uint32)
        if len(pair) == 2:
            n1, n2 = pair
            out.append((x % jnp.uint32(n1)).astype(I32))
            out.append(((x // jnp.uint32(n1)) % jnp.uint32(n2)).astype(I32))
        else:
            out.append((x % jnp.uint32(pair[0])).astype(I32))
    return out


def _one_eval():
    """Trace-time alternator: hero eval real, villain eval trivial."""
    calls = []

    def ev(m0, m1, m2, m3):
        calls.append(1)
        if len(calls) % 2 == 1:
            return evaluator.eval_masks_cmp_impl(m0, m1, m2, m3)
        return m0

    return ev


def sampler_fallback_word(shape, bounds):
    """One word/draw; exactness via one shared fallback word per rollout:
    lanes in the biased top region (p ~ 1e-8) take fallback % n instead.
    Residual bias ~ 1e-16."""
    fb = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    flip = I32(-(1 << 31))
    out = []
    for b in bounds:
        thresh = ((1 << 32) // b) * b
        t_signed = thresh ^ (1 << 31)
        t_signed = (t_signed - (1 << 32)) if t_signed >= (1 << 31) else t_signed
        x = pltpu.prng_random_bits(shape)
        ok = (x.astype(I32) ^ flip) < I32(t_signed)
        d = jnp.where(ok, (x.astype(jnp.uint32) % jnp.uint32(b)).astype(I32),
                      (fb % jnp.uint32(b)).astype(I32))
        out.append(d)
    return out


def sampler_ms16(shape, bounds):
    """One word/draw, Lemire multiply-shift via 16-bit halves:
    d = (x * n) >> 32 computed as ((xh*n) + ((xl*n) >> 16)) >> 16.
    No division/modulo ops at all; bias class same as mod (~1.2e-8)."""
    out = []
    for n in bounds:
        x = pltpu.prng_random_bits(shape).astype(I32)
        xh = jnp.right_shift(x, 16) & 0xFFFF
        xl = x & 0xFFFF
        d = jnp.right_shift(xh * n + jnp.right_shift(xl * n, 16), 16)
        out.append(d)
    return out


def masks_packed(cards, shape):
    """Two suits per int32 plane (suits 0/1 in bits 2..14 / 18..30 of plane
    A, suits 2/3 in plane B), then unpack once — fewer per-card selects."""
    del shape
    pa = jnp.zeros_like(cards[0])
    pb = jnp.zeros_like(cards[0])
    for card in cards:
        suit = jnp.right_shift(card * 5, 6)         # card // 13 for 0..63
        p = (card - 13 * suit + 2) | jnp.left_shift(suit & 1, 4)
        bitv = jnp.left_shift(jnp.ones_like(card), p)
        hi = suit > 1
        pa = pa | jnp.where(hi, 0, bitv)
        pb = pb | jnp.where(hi, bitv, 0)
    mask15 = (1 << 15) - 1
    return [pa & mask15, jnp.right_shift(pa, 16) & mask15,
            pb & mask15, jnp.right_shift(pb, 16) & mask15]


VARIANTS = {
    "current": {},
    "ms16": {"sampler": sampler_ms16},
    "ms16_packed": {"sampler": sampler_ms16, "masks": masks_packed},
    "old_packed": {"sampler": sampler_one_word_mod, "masks": masks_packed},
    "ms16_noeval": {"sampler": sampler_ms16,
                    "eval": lambda m0, m1, m2, m3: m0},
    "old_sampler": {"sampler": sampler_one_word_mod},
    "two_noreject": {"sampler": sampler_two_per_word_noreject},
    "fallback_word": {"sampler": sampler_fallback_word},
    "ref_eval": {"eval": evaluator.eval_masks_impl},
    "old_sampler_ref_eval": {"sampler": sampler_one_word_mod,
                             "eval": evaluator.eval_masks_impl},
    "no_eval": {"sampler": sampler_one_word_mod,
                "eval": lambda m0, m1, m2, m3: m0},
    "one_eval": {"sampler": sampler_one_word_mod, "eval_factory": _one_eval},
}


def run_variant(name, n, tile=None):
    spec = VARIANTS[name]
    orig_draws = pe._uniform_draws
    orig_eval = pe.eval_masks_cmp_impl
    orig_masks = pe._masks_of
    orig_tile, orig_tile_n = pe.TILE, pe.TILE_N
    try:
        if "sampler" in spec:
            pe._uniform_draws = spec["sampler"]
        if "masks" in spec:
            pe._masks_of = spec["masks"]
        if "eval" in spec:
            pe.eval_masks_cmp_impl = spec["eval"]
        if "eval_factory" in spec:
            pe.eval_masks_cmp_impl = spec["eval_factory"]()
        if tile:
            pe.TILE = tile
            pe.TILE_N = tile[0] * tile[1]
        jax.clear_caches()  # the jitted pallas_call must re-trace per variant
        hero = [make_card(0, 14), make_card(0, 13)]
        villain = [make_card(1, 12), make_card(2, 12)]

        def once(seed):
            t0 = time.perf_counter()
            w, t, m = pe.equity_vs_hand_pallas(seed, hero, villain, n)
            return time.perf_counter() - t0, w, t, m

        once(0)
        best, w, t, m = min(once(i + 1) for i in range(3))
        eq = (w + 0.5 * t) / m
        label = name + (f" tile={tile}" if tile else "")
        print(f"{label:28s} {m / best / 1e9:6.3f} Grollouts/s  "
              f"eq={eq:.5f}  ({best:.4f}s)", flush=True)
        return m / best
    finally:
        pe._uniform_draws = orig_draws
        pe.eval_masks_cmp_impl = orig_eval
        pe._masks_of = orig_masks
        pe.TILE, pe.TILE_N = orig_tile, orig_tile_n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 29)
    ap.add_argument("--variants", type=str, default=",".join(VARIANTS))
    ap.add_argument("--tiles", type=str, default="")
    ap.add_argument("--tile_variant", type=str, default="current")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)
    for name in args.variants.split(","):
        if name:
            run_variant(name, args.n)
    for tile in args.tiles.split(","):
        if tile:
            r, c = map(int, tile.split("x"))
            run_variant(args.tile_variant, args.n, tile=(r, c))


if __name__ == "__main__":
    main()
