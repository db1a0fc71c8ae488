"""One-off: price TPU primitives for a tighter duplicate expansion.

Measures: small scatter, cumsum/cummax scans, sort with extra payloads,
segment-fill via sort+scan — to decide if exact-compaction binning
(cap ~= live count) beats the dense two-level scheme.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 1_000_448
    cap = 4_000_000

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:4])

    def timeit(name, fn, *a):
        out = fn(*a)
        hard_sync(out)
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*a)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / 8 * 1000
        print(f"{name:44s} {ms:8.2f} ms", flush=True)
        return out

    starts = jnp.asarray(
        np.sort(rng.integers(0, cap, size=n)).astype(np.int32)
    )
    ids = jnp.asarray(np.arange(n, dtype=np.int32))
    zeros_cap = jnp.zeros(cap, jnp.int32)

    timeit(
        "scatter 1M i32 -> 4M buffer",
        jax.jit(lambda z, s, v: z.at[s].set(v)),
        zeros_cap, starts, ids,
    )
    timeit(
        "scatter-max 1M i32 -> 4M buffer",
        jax.jit(lambda z, s, v: z.at[s].max(v)),
        zeros_cap, starts, ids,
    )
    x4 = jnp.asarray(rng.integers(0, 2**31, size=cap).astype(np.int32))
    timeit("cumsum 4M i32", jax.jit(jnp.cumsum), x4)
    timeit("cummax 4M i32", jax.jit(lambda a: jax.lax.cummax(a)), x4)
    f4 = x4.astype(jnp.float32)
    timeit("cumsum 4M f32", jax.jit(jnp.cumsum), f4)

    k5 = jnp.asarray(rng.integers(0, 2**32, size=5_000_000, dtype=np.uint64).astype(np.uint32))
    v5 = jnp.arange(5_000_000, dtype=jnp.int32)
    timeit(
        "sort_key_val 5M (u32,i32)",
        jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, is_stable=True)),
        k5, v5,
    )
    timeit(
        "sort 5M (u32 + 2 i32 payloads)",
        jax.jit(
            lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1, is_stable=True)
        ),
        k5, v5, v5,
    )
    k4 = k5[:cap]
    v4 = v5[:cap]
    timeit(
        "sort_key_val 4M (u32,i32)",
        jax.jit(lambda k, v: jax.lax.sort_key_val(k, v, is_stable=True)),
        k4, v4,
    )
    # gathers of narrow columns at 3.3M rows (per-duplicate geometry fetch)
    src = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    idx33 = jnp.asarray(rng.integers(0, n, size=3_300_000).astype(np.int32))
    timeit("gather 3.3M x 1 col f32", jax.jit(lambda t, r: t[r]), src, idx33)
    src4 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    timeit("gather 3.3M x 4 col f32", jax.jit(lambda t, r: t[r]), src4, idx33)


if __name__ == "__main__":
    main()
