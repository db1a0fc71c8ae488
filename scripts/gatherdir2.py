"""Follow-up to gatherdir.py: the monotone-run gather penalty (38.5 vs
22.4 ns/row) survives DESCENDING and 4096-block-shuffled order — only
non-monotone query streams are fast.  Test the one reordering whose
un-permute is NOT a second gather: a stride interleave
j -> i = (j % A) * B + j // A, undone by reshape(B, A, w).transpose(1, 0, 2)
(2-D transposes measured ~free on this backend; is a sublane-granular
3-D one?).  Also test short monotone runs (16) to find the detector's
grain, and measure the 3-D transpose cost alone.
"""
import time
import numpy as np


def main():
    import jax, jax.numpy as jnp
    m, w = 4_800_000, 10
    A, B = 2048, 2832
    n = A * B  # 5_799_936 ~ garden n
    rng = np.random.default_rng(0)
    src = jax.device_put(rng.standard_normal((m + 1, w), dtype=np.float32))
    ends = np.sort(rng.integers(0, m + 1, n)).astype(np.int32)
    j = np.arange(n, dtype=np.int64)
    idx_stride = ends[(j % A) * B + j // A].astype(np.int32)
    # short monotone runs: shuffle 16-query blocks
    blk = 16
    perm16 = rng.permutation(n // blk)
    idx_b16 = ends.reshape(-1, blk)[perm16].reshape(-1).astype(np.int32)
    dev = {k: jax.device_put(v) for k, v in dict(
        ascending=ends, stride=idx_stride, blockshuf16=idx_b16).items()}

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
    # full plan: strided gather + transpose un-permute + consume in id order
    f_plan = jax.jit(
        lambda s, i: [jnp.sum(
            s[i].reshape(B, A, w).transpose(1, 0, 2).reshape(n, w).T
        )]
    )
    # transpose alone on resident data (un-permute cost floor)
    x = jax.device_put(rng.standard_normal((n, w), dtype=np.float32))
    f_tr = jax.jit(
        lambda v: [jnp.sum(v.reshape(B, A, w).transpose(1, 0, 2).T)]
    )
    t0 = timeit(f_base, src, dev["ascending"])
    for name, ii in dev.items():
        t = timeit(f_gath, src, ii)
        print(f"{name:12s} {t:8.1f} ms  (delta {t - t0:+8.1f} -> "
              f"{(t - t0) / n * 1e6:.1f} ns/row)", flush=True)
    t = timeit(f_plan, src, dev["stride"])
    print(f"stride+tr    {t:8.1f} ms  (delta {t - t0:+8.1f} -> "
          f"{(t - t0) / n * 1e6:.1f} ns/row)", flush=True)
    tt = timeit(f_tr, x)
    print(f"transpose3d  {tt:8.1f} ms  (vs base {t0:8.1f})", flush=True)


if __name__ == "__main__":
    main()
