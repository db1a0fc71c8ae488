"""Does index LOCALITY change big-source row-gather cost?

CLAUDE.md's gather model (7 ns/row @64MB, ~23 ns/row @448MB source,
independent of index pattern) was measured at bench scale.  The garden
gather reads 18.9M rows from a 371MB source — if locality matters there,
Morton-ordering the scene would cut the dominant garden cost.  Stages are
incremental single-jit prefixes (deltas = device time).
"""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    n, m, w = 5_800_960, 18_919_424, 16
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.standard_normal((n, w), dtype=np.float32))
    idx_rand = rng.integers(0, n, m).astype(np.int32)
    # local: sweeping 64k window (simulates Morton-ordered scene rows
    # gathered in tile order)
    base = (np.arange(m, dtype=np.int64) * n // m).astype(np.int64)
    idx_loc = ((base + rng.integers(-32768, 32768, m)) % n).astype(np.int32)
    idx_sort = np.sort(idx_rand).astype(np.int32)
    d_rand = jax.device_put(idx_rand); d_loc = jax.device_put(idx_loc)
    d_sort = jax.device_put(idx_sort)

    def hard_sync(o):
        np.asarray(np.asarray(jax.tree.leaves(o)[0]).reshape(-1)[:1])

    def timeit(fn, *a):
        o = fn(*a); hard_sync(o)
        t0 = time.perf_counter()
        for _ in range(4): o = fn(*a)
        hard_sync(o)
        return (time.perf_counter()-t0)/4*1000

    f_base = jax.jit(lambda s, i: [jnp.sum(s[:64]), jnp.sum(i[:64])])
    f_gath = jax.jit(lambda s, i: [jnp.sum(s[i].T)])
    t0 = timeit(f_base, src, d_rand)
    for name, ii in (("random", d_rand), ("local64k", d_loc),
                     ("sorted", d_sort)):
        t = timeit(f_gath, src, ii)
        print(f"{name:9s} {t:8.1f} ms  (delta {t-t0:+8.1f} -> "
              f"{(t-t0)/m*1e6:.1f} ns/row)", flush=True)

if __name__ == "__main__":
    main()
