"""One-off: does clamping dead gather indices to a single row help on TPU?

Compares a 7M-row gather with (a) fully random indices, (b) 53% random +
47% all-same-index (the live/dead split bin_splats sees at 1M splats), and
(c) 53% random + 47% clamped-to-last (sorted tail).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 1_000_448
    cap = 7_003_136
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    live = int(cap * 0.47)
    rnd = rng.integers(0, n, size=cap, dtype=np.int32)
    mixed = rnd.copy()
    mixed[live:] = n - 1
    sorted_dead = rnd.copy()
    sorted_dead[live:] = n - 1
    # variant where live indices are also somewhat sorted (as after tile sort)
    part_sorted = np.sort(rnd[:live]).astype(np.int32)
    ps = rnd.copy()
    ps[:live] = part_sorted
    ps[live:] = n - 1

    def hard_sync(out):
        np.asarray(out.reshape(-1)[:4])

    gather = jax.jit(lambda t, r: t[r])

    def timeit(name, idx):
        idx = jax.device_put(idx)
        out = gather(table, idx)
        hard_sync(out)
        out = gather(table, idx)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = gather(table, idx)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / 8 * 1000
        print(f"{name:40s} {ms:8.1f} ms", flush=True)

    timeit("gather 7M rows, all random", rnd)
    timeit("gather 7M rows, 47% same-row tail", mixed)
    timeit("gather 7M, live sorted + same-row tail", ps)
    timeit("gather 3.3M rows (live only)", rnd[:live])


if __name__ == "__main__":
    main()
