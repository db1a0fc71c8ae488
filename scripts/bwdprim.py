"""One-off: price backward-fold strategies for the binning VJP.

V1: today's path — transpose kernel grads to row-major, gather by inverse
    permutation from the 448MB gradient table, reshape-sum.
V3: V1 without the attribute-major<->row-major transposes.
V2: sort-based inverse — one 17-operand lax.sort keyed on the flat slot
    (perm payload), all attribute-major, no big gather at all.
V4: the 7M gather alone from a 448MB source vs 64MB source.
All variants are SINGLE jits reduced to scalars (dispatch-proof).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 1_000_448
    k1, k2 = 4, 12
    nb = n // 4
    cap = n * k1 + nb * k2
    W = 16

    perm = rng.permutation(cap).astype(np.int32)
    inv = np.empty(cap, np.int32)
    inv[perm] = np.arange(cap, dtype=np.int32)

    g_soa = jnp.asarray(rng.normal(size=(W, cap)).astype(np.float32))
    g_row = jnp.asarray(np.asarray(g_soa).T.copy())
    perm_d = jnp.asarray(perm)
    inv_d = jnp.asarray(inv)
    big_pos = jnp.asarray(rng.integers(0, nb, size=n).astype(np.int32))

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:1])

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
        print(f"{name:52s} {ms:8.1f} ms", flush=True)

    def fold_rowmajor(g, idx):
        g_ext = jnp.concatenate([g, jnp.zeros((1, W), g.dtype)], axis=0)
        g_by_flat = g_ext[jnp.minimum(idx, cap)]
        g1 = g_by_flat[: n * k1].reshape(k1, n, W).sum(axis=0)
        g2 = g_by_flat[n * k1 :].reshape(k2, nb, W).sum(axis=0)
        g2_ext = jnp.concatenate([g2, jnp.zeros((1, W), g.dtype)], axis=0)
        return g1 + g2_ext[jnp.minimum(big_pos, nb)]

    # V1: soa -> transpose -> gather-fold (today, if XLA doesn't cancel .T)
    timeit(
        "V1 g_soa.T -> invgather fold (today)",
        jax.jit(lambda gs, idx: jnp.sum(fold_rowmajor(gs.T, idx) ** 2)),
        g_soa, inv_d,
    )
    # V3: row-major input -> gather-fold (no transpose)
    timeit(
        "V3 row-major invgather fold (no transpose)",
        jax.jit(lambda g, idx: jnp.sum(fold_rowmajor(g, idx) ** 2)),
        g_row, inv_d,
    )

    # V2: sort-based inverse, fully attribute-major
    def fold_sort(gs, p):
        ops = (p,) + tuple(gs[j] for j in range(W))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        cols = out[1:]
        accs = []
        for c in cols:
            g1 = c[: n * k1].reshape(k1, n).sum(axis=0)
            g2 = c[n * k1 :].reshape(k2, nb).sum(axis=0)
            g2_ext = jnp.concatenate([g2, jnp.zeros((1,), c.dtype)])
            accs.append(g1 + g2_ext[jnp.minimum(big_pos, nb)])
        return sum(jnp.sum(a**2) for a in accs)

    timeit(
        "V2 17-operand sort fold (attribute-major)",
        jax.jit(fold_sort),
        g_soa, perm_d,
    )

    # V2b: sort only the 12 columns that carry gradient
    def fold_sort12(gs, p):
        ops = (p,) + tuple(gs[j] for j in range(12))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        cols = out[1:]
        accs = []
        for c in cols:
            g1 = c[: n * k1].reshape(k1, n).sum(axis=0)
            g2 = c[n * k1 :].reshape(k2, nb).sum(axis=0)
            g2_ext = jnp.concatenate([g2, jnp.zeros((1,), c.dtype)])
            accs.append(g1 + g2_ext[jnp.minimum(big_pos, nb)])
        return sum(jnp.sum(a**2) for a in accs)

    timeit(
        "V2b 13-operand sort fold",
        jax.jit(fold_sort12),
        g_soa, perm_d,
    )

    # V4: the gathers in isolation (448MB vs 64MB source)
    timeit(
        "V4 gather 7M rows from (7M,16)=448MB src",
        jax.jit(lambda g, idx: jnp.sum(g[jnp.minimum(idx, cap - 1)])),
        g_row, inv_d,
    )
    small = g_row[:n]
    idx_small = jnp.asarray(rng.integers(0, n, size=cap).astype(np.int32))
    timeit(
        "V4 gather 7M rows from (1M,16)=64MB src",
        jax.jit(lambda g, idx: jnp.sum(g[idx])),
        small, idx_small,
    )


if __name__ == "__main__":
    main()
