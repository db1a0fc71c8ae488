"""One-off: bisect the 133 ms key-construction cost inside bin_splats."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 1_000_448
    k1, k2 = 4, 12
    nb = n // 4
    tiles_x = 120
    num_tiles = 8160
    depth_bits = 32 - int(num_tiles + 1).bit_length()
    sentinel = jnp.int32(num_tiles)

    x0 = jnp.asarray(rng.integers(0, 119, size=n).astype(np.int32))
    y0 = jnp.asarray(rng.integers(0, 67, size=n).astype(np.int32))
    w = jnp.asarray(rng.integers(1, 5, size=n).astype(np.int32))
    count = jnp.asarray(rng.integers(0, 17, size=n).astype(np.int32))
    dq = jnp.asarray(rng.integers(0, 2**19, size=n).astype(np.uint32))
    big_ids = jnp.asarray(rng.integers(0, n, size=nb).astype(np.int32))

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:4])

    def timeit(name, fn, *a):
        out = fn(*a)
        hard_sync(out)
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(16):
            out = fn(*a)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / 16 * 1000
        print(f"{name:46s} {ms:8.2f} ms", flush=True)
        return out

    def fdiv(a, b):
        q = jnp.floor(
            (jnp.asarray(a).astype(jnp.float32) + 0.5)
            / jnp.asarray(b).astype(jnp.float32)
        )
        return q.astype(jnp.int32)

    kk1 = jnp.arange(0, k1, dtype=jnp.int32)[None, :]

    # v1: level-1 only, float div, no ids gather
    def v1(x0, y0, w, count, dq):
        w_s = jnp.maximum(w, 1)[:, None]
        qq = fdiv(kk1, w_s)
        rr = kk1 - qq * w_s
        tiles = (y0[:, None] + qq) * tiles_x + x0[:, None] + rr
        live = kk1 < count[:, None]
        tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
        return ((tiles << jnp.uint32(depth_bits)) | dq[:, None]).reshape(-1)

    timeit("L1 keys (4M), float div", jax.jit(v1), x0, y0, w, count, dq)

    # v2: level-1 only, int div
    def v2(x0, y0, w, count, dq):
        w_s = jnp.maximum(w, 1)[:, None]
        tiles = (y0[:, None] + kk1 // w_s) * tiles_x + x0[:, None] + kk1 % w_s
        live = kk1 < count[:, None]
        tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
        return ((tiles << jnp.uint32(depth_bits)) | dq[:, None]).reshape(-1)

    timeit("L1 keys (4M), int div", jax.jit(v2), x0, y0, w, count, dq)

    # v3: no div at all
    def v3(x0, y0, w, count, dq):
        tiles = (y0[:, None] + kk1) * tiles_x + x0[:, None]
        live = kk1 < count[:, None]
        tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
        return ((tiles << jnp.uint32(depth_bits)) | dq[:, None]).reshape(-1)

    timeit("L1 keys (4M), no div", jax.jit(v3), x0, y0, w, count, dq)

    # v4: no u32 shift/or — keep i32
    def v4(x0, y0, w, count, dq):
        w_s = jnp.maximum(w, 1)[:, None]
        qq = fdiv(kk1, w_s)
        rr = kk1 - qq * w_s
        tiles = (y0[:, None] + qq) * tiles_x + x0[:, None] + rr
        live = kk1 < count[:, None]
        return jnp.where(live, tiles, sentinel).reshape(-1)

    timeit("L1 keys (4M), f-div, no u32 pack", jax.jit(v4), x0, y0, w, count, dq)

    # v5: level-2 only (gathers of 250k ids + (250k,12) math)
    kk2 = jnp.arange(k1, k1 + k2, dtype=jnp.int32)[None, :]

    def v5(x0, y0, w, count, dq, ids):
        w_s = jnp.maximum(w[ids], 1)[:, None]
        qq = fdiv(kk2, w_s)
        rr = kk2 - qq * w_s
        tiles = (y0[ids][:, None] + qq) * tiles_x + x0[ids][:, None] + rr
        live = kk2 < count[ids][:, None]
        tiles = jnp.where(live, tiles, sentinel).astype(jnp.uint32)
        return ((tiles << jnp.uint32(depth_bits)) | dq[ids][:, None]).reshape(-1)

    timeit("L2 keys (3M) incl 250k gathers", jax.jit(v5), x0, y0, w, count, dq, big_ids)

    # v6: 7M u32 elementwise only (shift+or+where)
    big = jnp.asarray(
        rng.integers(0, 2**31, size=n * k1 + nb * k2).astype(np.int32)
    )

    def v6(a):
        t = jnp.where(a > 5, a, sentinel).astype(jnp.uint32)
        return (t << jnp.uint32(depth_bits)) | jnp.uint32(3)

    timeit("7M u32 shift/or/where elementwise", jax.jit(v6), big)

    # v7: slot_row construction (broadcast+reshape+concat 7M i32)
    def v7(ids):
        all_ids = jnp.arange(n, dtype=jnp.int32)
        return jnp.concatenate(
            [
                jnp.broadcast_to(all_ids[:, None], (n, k1)).reshape(-1),
                jnp.broadcast_to(ids[:, None], (nb, k2)).reshape(-1),
            ]
        )

    timeit("slot_row (7M i32 broadcast+concat)", jax.jit(v7), big_ids)

    # v8: full two-level key construction (v1-style + v5 + concat)
    def v8(x0, y0, w, count, dq, ids):
        return jnp.concatenate(
            [v1(x0, y0, w, count, dq), v5(x0, y0, w, count, dq, ids)]
        )

    timeit("full keys (7M) f-div", jax.jit(v8), x0, y0, w, count, dq, big_ids)


if __name__ == "__main__":
    main()
