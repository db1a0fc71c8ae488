"""Does query-ORDER direction change big-source row-gather cost?

gatherloc.py showed exactly-ASCENDING indices are ~1.7x slower than
random (38.9 vs 22.5 ns/row @371MB).  The fold's segment extraction
(ops/fold.py step 4) gathers at `ends` — non-strictly ascending by
construction — from the ~190MB in-block-cumsum source: 183 ms at garden
(PERF.md r5), the single largest fused-path term.  If DESCENDING or
BLOCK-SHUFFLED-ascending order dodges the penalty, the extraction can run
in a flipped/permuted domain for a pure win (prev() stays a shift under
flip).  Shapes match the garden fold exactly.
"""
import time
import numpy as np


def main():
    import jax, jax.numpy as jnp
    m, n, w = 4_800_000, 5_800_960, 10  # grad rows, splats, packed cols
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.standard_normal((m + 1, w), dtype=np.float32))
    # ends: non-strict ascending, ~m/n rows per splat with jitter + zeros
    ends = np.sort(rng.integers(0, m + 1, n)).astype(np.int32)
    idx_asc = ends
    idx_desc = ends[::-1].copy()
    idx_rand = rng.permutation(ends).astype(np.int32)
    blk = 4096  # block-shuffled: ascending inside 4096-query blocks
    nb = n // blk * blk
    perm = rng.permutation(nb // blk)
    idx_blk = np.concatenate(
        [ends[:nb].reshape(-1, blk)[perm].reshape(-1), ends[nb:]]
    ).astype(np.int32)
    dev = {k: jax.device_put(v) for k, v in dict(
        ascending=idx_asc, descending=idx_desc, random=idx_rand,
        blockshuf=idx_blk).items()}

    def hard_sync(o):
        np.asarray(np.asarray(jax.tree.leaves(o)[0]).reshape(-1)[:1])

    def timeit(fn, *a):
        o = fn(*a); hard_sync(o)
        t0 = time.perf_counter()
        for _ in range(4):
            o = fn(*a)
        hard_sync(o)
        return (time.perf_counter() - t0) / 4 * 1000

    f_base = jax.jit(lambda s, i: [jnp.sum(s[:64]), jnp.sum(i[:64])])
    f_gath = jax.jit(lambda s, i: [jnp.sum(s[i].T)])
    # flip-domain variant: gather at reversed queries THEN flip the result
    # back (what the fold would do) — tests whether XLA fuses the flip
    f_flip = jax.jit(lambda s, i: [jnp.sum(jnp.flip(s[i], axis=0).T)])
    t0 = timeit(f_base, src, dev["ascending"])
    for name, ii in dev.items():
        t = timeit(f_gath, src, ii)
        print(f"{name:10s} {t:8.1f} ms  (delta {t - t0:+8.1f} -> "
              f"{(t - t0) / n * 1e6:.1f} ns/row)", flush=True)
    t = timeit(f_flip, src, dev["descending"])
    print(f"desc+flip  {t:8.1f} ms  (delta {t - t0:+8.1f} -> "
          f"{(t - t0) / n * 1e6:.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
