"""One-off: compare backward-fold strategies for the binning VJP.

The fold must route (cap,) gradient rows from SORTED order back to
FLAT-slot order (an inverse permutation).  Candidates, each measured as a
single jit reduced to scalars (per CLAUDE.md: separate-jit micro-benchmarks
lie on this backend; incremental prefixes of one program are truthful):

  A  inputs only (baseline to subtract)
  B  A + inv_perm via sort_key_val(perm, iota)          [today's fwd extra]
  C  B + 9-col f32 inverse gather + level reshape sums  [today's bwd fold]
  D  like C, gather source cast to bf16
  E  A + ONE lax.sort(perm, 9 f32 payload cols) + sums  [sort-carry fold]
  F  E with bf16 payloads
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 1_000_448
    k1 = 4
    cap = 5_750_000 // 128 * 128  # ~today's flat-slot capacity at 1M splats
    lvl1 = k1 * n
    width = 9

    rng = np.random.default_rng(0)
    perm = jax.device_put(
        rng.permutation(cap).astype(np.int32)
    )
    g_soa = jax.device_put(
        rng.standard_normal((16, cap), dtype=np.float32)
    )

    def hard_sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(np.asarray(leaf).reshape(-1)[:1])

    def timeit(fn, *a):
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*a)
        hard_sync(out)
        return (time.perf_counter() - t0) / 8 * 1000

    def sums_from_flat(g_by_flat):
        acc = [jnp.sum(g_by_flat[: lvl1].reshape(k1, n, width).sum(axis=0))]
        acc.append(jnp.sum(g_by_flat[lvl1:]))
        return acc

    def stage_a(perm, g_soa):
        return [jnp.sum(perm), jnp.sum(g_soa[:width])]

    def stage_b(perm, g_soa):
        acc = stage_a(perm, g_soa)
        _, inv = jax.lax.sort_key_val(
            perm, jnp.arange(cap, dtype=jnp.int32)
        )
        return acc + [jnp.sum(inv)]

    def gather_fold(perm, g_soa, dtype):
        acc = stage_a(perm, g_soa)
        _, inv = jax.lax.sort_key_val(
            perm, jnp.arange(cap, dtype=jnp.int32)
        )
        g_rows = g_soa[:width].T.astype(dtype)  # (cap, 9) source
        g_ext = jnp.concatenate(
            [g_rows, jnp.zeros((1, width), dtype)], axis=0
        )
        g_by_flat = g_ext[jnp.minimum(inv, cap)].astype(jnp.float32)
        return acc + sums_from_flat(g_by_flat)

    def sort_fold(perm, g_soa, dtype):
        acc = stage_a(perm, g_soa)
        ops = (perm,) + tuple(
            g_soa[j].astype(dtype) for j in range(width)
        )
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        cols = [c.astype(jnp.float32) for c in sorted_ops[1:]]
        g_by_flat = jnp.stack(cols, axis=0).T  # (cap, 9) flat order
        return acc + sums_from_flat(g_by_flat)

    def sort_fold_soa(perm, g_soa, dtype):
        # avoid the stack/transpose: reduce levels per column
        acc = stage_a(perm, g_soa)
        ops = (perm,) + tuple(
            g_soa[j].astype(dtype) for j in range(width)
        )
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        for c in sorted_ops[1:]:
            c = c.astype(jnp.float32)
            acc.append(jnp.sum(c[:lvl1].reshape(k1, n).sum(axis=0)))
            acc.append(jnp.sum(c[lvl1:]))
        return acc

    def sort_fold_packed(perm, g_soa):
        # bf16 payloads packed PAIRWISE into u32: 9 cols -> 5 sort operands
        # (sort cost is dominated by operand count, see E vs F)
        acc = stage_a(perm, g_soa)
        u16s = [
            jax.lax.bitcast_convert_type(
                g_soa[j].astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            for j in range(width)
        ]
        u16s.append(jnp.zeros_like(u16s[0]))
        packed = tuple(
            u16s[2 * i] | (u16s[2 * i + 1] << jnp.uint32(16))
            for i in range((width + 1) // 2)
        )
        sorted_ops = jax.lax.sort((perm,) + packed, num_keys=1)
        cols = []
        for p in sorted_ops[1:]:
            for sh in (0, 16):
                cols.append(
                    jax.lax.bitcast_convert_type(
                        ((p >> jnp.uint32(sh)) & jnp.uint32(0xFFFF)).astype(
                            jnp.uint16
                        ),
                        jnp.bfloat16,
                    ).astype(jnp.float32)
                )
        cols = cols[:width]
        g_by_flat = jnp.stack(cols, axis=0).T
        return acc + sums_from_flat(g_by_flat)

    def sort_fold_packed_soa(perm, g_soa):
        # packed sort + per-column level sums (no (cap, 9) stack/transpose)
        acc = stage_a(perm, g_soa)
        u16s = [
            jax.lax.bitcast_convert_type(
                g_soa[j].astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            for j in range(width)
        ]
        u16s.append(jnp.zeros_like(u16s[0]))
        packed = tuple(
            u16s[2 * i] | (u16s[2 * i + 1] << jnp.uint32(16))
            for i in range((width + 1) // 2)
        )
        sorted_ops = jax.lax.sort((perm,) + packed, num_keys=1)
        for p in sorted_ops[1:]:
            for sh in (0, 16):
                c = jax.lax.bitcast_convert_type(
                    ((p >> jnp.uint32(sh)) & jnp.uint32(0xFFFF)).astype(
                        jnp.uint16
                    ),
                    jnp.bfloat16,
                ).astype(jnp.float32)
                acc.append(jnp.sum(c[:lvl1].reshape(k1, n).sum(axis=0)))
                acc.append(jnp.sum(c[lvl1:]))
        return acc

    stages = [
        ("A inputs", jax.jit(stage_a)),
        ("B +invperm sort", jax.jit(stage_b)),
        ("C +f32 gather fold", jax.jit(
            lambda p, g: gather_fold(p, g, jnp.float32))),
        ("D +bf16 gather fold", jax.jit(
            lambda p, g: gather_fold(p, g, jnp.bfloat16))),
        ("E sort-carry f32", jax.jit(
            lambda p, g: sort_fold(p, g, jnp.float32))),
        ("F sort-carry bf16", jax.jit(
            lambda p, g: sort_fold(p, g, jnp.bfloat16))),
        ("G sort-carry f32 soa-sum", jax.jit(
            lambda p, g: sort_fold_soa(p, g, jnp.float32))),
        ("H sort-carry bf16 packed", jax.jit(sort_fold_packed)),
        ("I packed soa-sum", jax.jit(sort_fold_packed_soa)),
    ]
    import os

    only = os.environ.get("FOLDBENCH_ONLY")
    if only:
        letters = set(only.split(","))
        stages = [s for s in stages if s[0].split()[0] in letters]
    base = None
    for name, fn in stages:
        ms = timeit(fn, perm, g_soa)
        if base is None:
            base = ms
        print(f"{name:26s} {ms:8.1f} ms   delta-vs-A {ms - base:+8.1f}",
              flush=True)


if __name__ == "__main__":
    main()
