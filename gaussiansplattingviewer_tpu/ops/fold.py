"""Splat-id gradient fold: compact gradient rows -> per-splat sums.

The classic backward fold (binning._gather_table_rows_bwd) sorts the FULL
slot capacity (key = flat slot index) so per-splat sums fall out of dense
level reshapes — cost proportional to CAPACITY, which at garden scale is
~8x the rows the blend kernels actually processed (81% early-stop dead
weight, PERF.md r4).  This module folds by SPLAT ID instead, over exactly
the rows the backward kernel wrote (the compact attribute-major gradient
buffer of the fused super-op, ops/fused.py):

  1. bf16-pair-pack the 9 gradient rows into 5 u32 rows while still
     ATTRIBUTE-major (contiguous row ops), then ONE transpose to row-major
     — measured ~free on this backend (0.4 ms per 64M elements), unlike
     minor-dim stacks/flattens (~45 ms per 7M, the layout rule that shaped
     this pipeline);
  2. ONE 2-operand sort of (id, position) and ONE row gather bring the
     packed rows into id order, row-major;
  3. blocked inclusive prefix sums: in-block (128-row) f32 cumsum + a
     compensated double-f32 exclusive scan over block totals, so segment
     sums extracted by differencing are accurate to ~ulp of LOCAL 128-row
     magnitudes, never of the global running sum (a plain f32 cumsum+diff
     can lose all bits of a small splat's gradient to cancellation);
  4. per-splat totals = c(end_i) - c(end_{i-1}) with the coarse (block)
     part differenced in double-f32 via an exact TwoSum-based diff, using
     TWO n-row gathers (in-block values + packed coarse hi/lo) — no
     sentinel rows; absent ids difference to exactly zero.  Both gathers
     run in STRIDE-INTERLEAVED order (ops/stride_gather): `ends` is
     non-decreasing, and monotone small-step query streams pay a
     measured 1.7x gather penalty that the interleave dodges.

No scatter anywhere; every op is jit/shard_map-safe and runs on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.ops import binning
from gaussiansplattingviewer_tpu.ops.stride_gather import (
    stride_perm_iota,
    unpermute_rows,
)

_BLK = 128  # in-block cumsum width (one lane tile)


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (all f32 ops)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _comp_scan_incl(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inclusive prefix sum of ``x`` along axis 0 in compensated double-f32:
    returns (hi, lo) with hi + lo ~ exact prefix (error ~2^-46 relative).
    associative_scan's combine order varies, but every combine is a
    compensated add, so accuracy holds for any order."""

    def combine(a, b):
        ah, al = a
        bh, bl = b
        s, e = _two_sum(ah, bh)
        return s, e + al + bl

    zeros = jnp.zeros_like(x)
    return jax.lax.associative_scan(combine, (x, zeros), axis=0)


def fold_rows_by_id(
    g_soa: jax.Array, n: int, fold_bf16: bool
) -> jax.Array:
    """(TABLE_WIDTH, G) compact attribute-major gradient rows ->
    (n, TABLE_WIDTH) per-splat gradient sums (columns >= GRAD_WIDTH zero).

    Row COL_COUNT of ``g_soa`` holds the owning splat id as an exact f32
    integer (the fused table carries it; the backward kernel copies it
    beside the gradients).  Columns with zero gradient — dead lanes,
    never-written buffer tail (id 0 from the zero init) — fold harmlessly.
    """
    gcap = g_soa.shape[1]
    w9 = binning.GRAD_WIDTH  # 9 gradient rows
    ids = g_soa[binning.COL_COUNT, :].astype(jnp.int32)

    # --- 1. pack attribute-major, then ONE (free) transpose to row-major
    if fold_bf16:
        rows10 = g_soa[: w9 + 1, :]  # (10, G), row 9 is zero padding
        u16 = jax.lax.bitcast_convert_type(
            rows10.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)  # (10, G)
        packed_soa = u16[0::2, :] | (u16[1::2, :] << jnp.uint32(16))
        vals_src = packed_soa.T  # (G, 5) u32 row-major
        w = 10
    else:
        vals_src = g_soa[: w9 + 1, :].T  # (G, 10) f32 row-major
        w = 10

    # --- 2. order by id; one row gather brings the payload along
    _, order = jax.lax.sort(
        (ids, jnp.arange(gcap, dtype=jnp.int32)), num_keys=1
    )
    taken = vals_src[order]
    if fold_bf16:
        u16p = jax.lax.bitcast_convert_type(taken, jnp.uint16)  # (m,5,2)
        vals = (
            jax.lax.bitcast_convert_type(u16p, jnp.bfloat16)
            .reshape(gcap, w)
            .astype(jnp.float32)
        )
    else:
        vals = taken

    # --- 3. blocked prefix sums; pad m to a block multiple (padded grads
    # are zero, so they never perturb a prefix)
    m = -(-gcap // _BLK) * _BLK
    if m != gcap:
        vals = jnp.concatenate(
            [vals, jnp.zeros((m - gcap, w), jnp.float32)]
        )
    mb = m // _BLK
    in_csum = jnp.cumsum(vals.reshape(mb, _BLK, w), axis=1)
    block_tot = in_csum[:, -1, :]  # (mb, w)
    co_hi, co_lo = _comp_scan_incl(block_tot)  # inclusive over blocks

    # --- 4. segment extraction by differencing at id boundaries.
    # ends_i = #rows with id <= i; e_i = ends_i - 1 is the last row of
    # id <= i.  c(e) = coarse_excl[e // BLK] + in_block(e); absent ids
    # difference to zero because their end equals the previous end.
    #
    # ends via ONE combined sort + an inverse-permutation SLICE (total two
    # 2-operand sorts over G+n).  jnp.searchsorted was measured
    # catastrophic here at either method: "scan" does log2(G) gather
    # passes over all n queries (~1.2 s at garden — the r5 fused path's
    # first-run regression), "sort" still cost 148 ms vs 36 for this.
    # Key trick: real rows get key id<<1, probe i gets (i<<1)|1, so after
    # sorting, probe i sits after every real row with id <= i at position
    # ends_i + i; the probes' positions are a CONTIGUOUS slice of the
    # inverse permutation (their original indices are the tail).
    #
    # The probes are emitted in STRIDE-INTERLEAVED id order
    # (ops/stride_gather): ends is non-decreasing in i, and monotone
    # small-step query streams pay the 1.7x gather penalty (~183 ms at
    # garden, the fold's measured floor in r5).  Probe j carries id
    # perm[j]; probe values are distinct, so its sorted position is
    # ends(perm[j]) + perm[j] and the big gathers below run at the
    # random-stream rate; one free transpose restores splat order.
    perm_i = stride_perm_iota(n)  # (n_p,) with n_p = A*B >= n
    n_p = perm_i.shape[0]
    keys2 = jnp.concatenate([ids << 1, (perm_i << 1) | 1])
    mext = gcap + n_p
    iota_ext = jnp.arange(mext, dtype=jnp.int32)
    _, pay = jax.lax.sort((keys2, iota_ext), num_keys=1)
    _, inv = jax.lax.sort((pay, iota_ext), num_keys=1)
    ends_s = inv[gcap:] - perm_i  # (n_p,) = #real rows with id <= perm[j]
    in_ext = jnp.concatenate(
        [jnp.zeros((1, w), jnp.float32), in_csum.reshape(m, w)]
    )
    co_pack = jnp.concatenate(
        [
            jnp.zeros((1, 2 * w), jnp.float32),
            jnp.concatenate([co_hi, co_lo], axis=1),
        ]
    )  # (mb + 1, 2w): row k+1 = inclusive coarse of block k
    co_idx_s = jnp.maximum((ends_s - 1) // _BLK, 0)  # block of e_i
    # in-block inclusive at e_i (0 if ends=0) | coarse EXCLUSIVE of its
    # block — gathered in strided order, un-permuted by free transposes
    e_in = unpermute_rows(in_ext[ends_s], n)
    e_co = unpermute_rows(co_pack[co_idx_s], n)

    def prev(a):
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]])

    d_hi, d_err = _two_sum(e_co[:, :w], -prev(e_co[:, :w]))
    small = (
        d_err
        + (e_co[:, w:] - prev(e_co[:, w:]))
        + (e_in - prev(e_in))
    )
    totals = (d_hi + small)[:, :w9]  # (n, 9)

    return jnp.concatenate(
        [
            totals,
            jnp.zeros((n, binning.TABLE_WIDTH - w9), jnp.float32),
        ],
        axis=1,
    )
