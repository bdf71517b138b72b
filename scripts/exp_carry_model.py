"""Micro-benchmark: what does the engine kernel's VMEM loop carry cost?

Pins the cost model behind PERF.md's "carry floor" before investing in
state packing: a pallas kernel with an [R, 8, 128] i32 carry and a
near-trivial body, swept over R, plus two structural variants at the
engine's R=141 (dict-of-rows carry = the engine's current shape;
ref-resident = load/store the block each iteration, no loop carry).

Run on the TPU: python scripts/exp_carry_model.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

I32 = jnp.int32
TILE = (8, 128)
N_BLOCKS = 1024
N_STEPS = 512


def time_call(call, *args):
    out = call(*args)
    _ = int(out[0, 0, 0, 0])  # tunnel sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = call(*args)
        _ = int(out[0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best / (N_BLOCKS * TILE[0] * TILE[1] * N_STEPS) * 1e9


def carry_array(R):
    def kernel(state_ref, out_ref):
        x = state_ref[0]

        def body(i, x):
            return x + 1

        out_ref[0] = jax.lax.fori_loop(0, N_STEPS, body, x)

    spec = pl.BlockSpec((1, R) + TILE, lambda i: (i, 0, 0, 0))
    return jax.jit(pl.pallas_call(
        kernel, grid=(N_BLOCKS,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS, R) + TILE, I32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))))


def carry_dict(R):
    """R single rows carried as a dict — the engine's current shape."""
    def kernel(state_ref, out_ref):
        st = {f"r{j}": state_ref[0, j] for j in range(R)}

        def body(i, st):
            return {k: v + 1 for k, v in st.items()}

        st = jax.lax.fori_loop(0, N_STEPS, body, st)
        out_ref[0] = jnp.stack([st[f"r{j}"] for j in range(R)], axis=0)

    spec = pl.BlockSpec((1, R) + TILE, lambda i: (i, 0, 0, 0))
    return jax.jit(pl.pallas_call(
        kernel, grid=(N_BLOCKS,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS, R) + TILE, I32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))))


def ref_resident(R):
    """No loop carry: the block lives in the out ref; each iteration
    loads, bumps, and stores it."""
    def kernel(state_ref, out_ref):
        out_ref[0] = state_ref[0]

        def body(i, _):
            out_ref[0] = out_ref[0] + 1
            return 0

        jax.lax.fori_loop(0, N_STEPS, body, 0)

    spec = pl.BlockSpec((1, R) + TILE, lambda i: (i, 0, 0, 0))
    return jax.jit(pl.pallas_call(
        kernel, grid=(N_BLOCKS,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS, R) + TILE, I32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))))


def main():
    x16 = jnp.zeros((N_BLOCKS, 16) + TILE, I32)
    results = {}
    for R in (16, 36, 70, 141):
        x = jnp.zeros((N_BLOCKS, R) + TILE, I32)
        results[f"array_R{R}"] = time_call(carry_array(R), x)
        print(json.dumps({f"array_R{R}": results[f"array_R{R}"]}),
              flush=True)
    x = jnp.zeros((N_BLOCKS, 141) + TILE, I32)
    results["dict_R141"] = time_call(carry_dict(141), x)
    print(json.dumps({"dict_R141": results["dict_R141"]}), flush=True)
    results["ref_R141"] = time_call(ref_resident(141), x)
    print(json.dumps({"ref_R141": results["ref_R141"]}), flush=True)
    print(json.dumps({"ns_per_table_step": results}))


if __name__ == "__main__":
    main()
