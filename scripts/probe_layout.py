"""Layout probe: is the engine's VPU cost dominated by lane padding?

The engine state is vmapped with tables as the LEADING axis, so layer
arrays are [T, L] with L=8 minor — if XLA keeps that layout, the 8-wide
minor dim occupies 8 of 128 lanes (~6% lane efficiency). This probe times
an update_bets-shaped op mix (cumsum/argmax/roll/select along L, per-table
scalar reductions) under both layouts inside a lax.scan, at 2^20 tables.

Run on the TPU: `python scripts/probe_layout.py`
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

T = 1 << 20
L = 8
STEPS = 64


def body_tables_leading(amt, mem, bet):
    # amt, mem: [T, L]; bet: [T]
    idx = jnp.arange(L)[None, :]
    valid = amt > 0
    amt_v = jnp.where(valid, amt, 0)
    prefix = jnp.cumsum(amt_v, axis=1)
    stop = valid & (bet[:, None] <= prefix)
    i_star = jnp.argmax(stop, axis=1)
    keep = idx <= i_star[:, None]
    amt2 = jnp.where(keep, amt, jnp.roll(amt, 1, axis=1))
    mem2 = jnp.where(keep, mem | 4, jnp.roll(mem, 1, axis=1))
    total = jnp.sum(jnp.where(valid, amt2, 0), axis=1)
    amt3 = jnp.where(idx == (i_star[:, None] + 1) % L,
                     amt2 + (bet[:, None] & 7), amt2)
    return amt3, mem2, (total & 63) + 1


def body_tables_minor(amt, mem, bet):
    # amt, mem: [L, T]; bet: [T]
    idx = jnp.arange(L)[:, None]
    valid = amt > 0
    amt_v = jnp.where(valid, amt, 0)
    prefix = jnp.cumsum(amt_v, axis=0)
    stop = valid & (bet[None, :] <= prefix)
    i_star = jnp.argmax(stop, axis=0)
    keep = idx <= i_star[None, :]
    amt2 = jnp.where(keep, amt, jnp.roll(amt, 1, axis=0))
    mem2 = jnp.where(keep, mem | 4, jnp.roll(mem, 1, axis=0))
    total = jnp.sum(jnp.where(valid, amt2, 0), axis=0)
    amt3 = jnp.where(idx == (i_star[None, :] + 1) % L,
                     amt2 + (bet[None, :] & 7), amt2)
    return amt3, mem2, (total & 63) + 1


def run(name, make, body):
    amt, mem, bet = make()

    @jax.jit
    def prog(amt, mem, bet):
        def step(carry, _):
            a, m, b = carry
            return body(a, m, b), None
        (a, m, b), _ = jax.lax.scan(step, (amt, mem, bet), None, length=STEPS)
        return jnp.sum(a) + jnp.sum(m) + jnp.sum(b)

    r = prog(amt, mem, bet)
    _ = int(r)  # tunnel sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = prog(amt, mem, bet)
        _ = int(r)
        best = min(best, time.perf_counter() - t0)
    ns = best / (T * STEPS) * 1e9
    print(f"{name}: {best*1e3:.1f} ms, {ns:.2f} ns/table-step")
    return ns


def main():
    k = jax.random.key(0)

    def make_leading():
        amt = jax.random.randint(k, (T, L), 0, 5, jnp.int32)
        mem = jax.random.randint(k, (T, L), 0, 63, jnp.int32)
        bet = jax.random.randint(k, (T,), 1, 20, jnp.int32)
        return amt, mem, bet

    def make_minor():
        amt, mem, bet = make_leading()
        return amt.T, mem.T, bet

    a = run("tables-leading [T, L]", make_leading, body_tables_leading)
    b = run("tables-minor  [L, T]", make_minor, body_tables_minor)
    print(f"speedup minor/leading: {a / b:.2f}x")


if __name__ == "__main__":
    main()
