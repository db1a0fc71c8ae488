"""Budgeted stream compaction with a scatter-free VJP.

Selecting "the rows where mask is true" has a data-dependent shape, which
XLA cannot compile; the TPU-native pattern (same trick as ops/binning's
pools) is a BUDGETED compaction: one stable sort moves selected rows to
the front, a static-size slice takes the first ``budget`` of them, and an
overflow count reports how many selected rows were dropped.

Used by parallel/sharded_render for two things the naive formulation does
O(N) work per chip on:
  * tile-row sharding: each chip compacts the splats intersecting ITS row
    set before binning, so per-chip binning cost scales ~1/n_shards
    instead of every chip paying full-N slot allocation;
  * splat sharding: each chip compacts its frustum survivors before the
    ICI all-gather, so the collective moves ~survivor bytes, not raw-N
    bytes (BASELINE north star: "frustum-culled splat lists sharded
    across chips").

The gather is a selection permutation, so its exact VJP is a gather
through the inverse permutation (computed with one key-value sort in the
forward, DCE'd in inference graphs) — no TPU scatter anywhere, mirroring
ops/binning._gather_table_rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.ops.stride_gather import gather_rows_strided


def _invert_permutation(perm: jax.Array) -> jax.Array:
    n = perm.shape[0]
    _, inv = jax.lax.sort_key_val(perm, jnp.arange(n, dtype=jnp.int32))
    return inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _take_rows(budget, x, sel, inv_perm):
    """x[sel[:budget]] with a scatter-free VJP.

    sel is a permutation of [0, n) with the selected rows first; inv_perm
    its inverse.  Rows of x whose rank >= budget get zero gradient.

    Both directions gather with ASCENDING small-step index streams (sel's
    selected prefix / inv_perm's rank sequence are monotone from the
    stable partition), so they run stride-interleaved — see
    ops/stride_gather for the measured 1.7x monotone-query penalty.
    """
    return gather_rows_strided(x, sel[:budget])


def _take_rows_fwd(budget, x, sel, inv_perm):
    return gather_rows_strided(x, sel[:budget]), (inv_perm,)


def _take_rows_bwd(budget, res, g):
    (inv_perm,) = res
    zero = jnp.zeros_like(g[:1])
    g_ext = jnp.concatenate([g, zero], axis=0)
    idx = jnp.minimum(inv_perm, budget)  # dropped rows -> zero row
    return gather_rows_strided(g_ext, idx), None, None


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def compact_by_mask(tree, mask: jax.Array, budget: int):
    """Compact every leaf of ``tree`` (same leading dim as mask) to its
    ``mask``-selected rows, padded/truncated to the static ``budget``.

    Returns (compact_tree, kept (budget,) bool, dropped () i32):
      * rows [0, min(count, budget)) of each compact leaf are the selected
        rows in their original relative order (stable);
      * ``kept`` flags which compact rows are genuinely selected (tail
        rows beyond the selected count hold arbitrary unselected data —
        mask them with ``kept`` before use);
      * ``dropped`` counts selected rows that exceeded the budget
        (overflow diagnostic, 0 in normal operation).

    Differentiable w.r.t. tree leaves (inexact dtypes); the VJP routes
    compact-row gradients back to their source rows with one gather.
    """
    n = mask.shape[0]
    budget = min(budget, n)
    # stable partition: selected rows first, original order preserved
    sel = jnp.argsort(jnp.where(mask, 0, 1).astype(jnp.int32), stable=True)
    inv_perm = _invert_permutation(sel)
    count = jnp.sum(mask.astype(jnp.int32))
    kept = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(count, budget)
    dropped = jnp.maximum(count - budget, 0)

    def take(leaf):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
            return _take_rows(budget, leaf, sel, inv_perm)
        return gather_rows_strided(jnp.asarray(leaf), sel[:budget])

    compact = jax.tree.map(take, tree)
    return compact, kept, dropped


def pack_splats(splats):
    """ProjectedSplats -> ((N, 16) f32 rows, (N,) bool valid).

    Row layout = ops/binning's table columns (pack_table), so a packed
    splat set round-trips losslessly through unpack_splats.  Used to make
    compaction/exchange ONE row gather / one collective operand instead of
    seven (row-gather cost is ~width-independent, so per-leaf gathers were
    the sharded path's dominant fixed cost).
    """
    from gaussiansplattingviewer_tpu.ops import binning

    return binning.pack_table(splats), splats.valid


def unpack_splats(rows, valid):
    """Inverse of pack_splats (column slices; XLA fuses them)."""
    from gaussiansplattingviewer_tpu.ops import binning as b
    from gaussiansplattingviewer_tpu.ops.projection import ProjectedSplats

    return ProjectedSplats(
        mean2d=rows[:, b.COL_CX : b.COL_CY + 1],
        depth=rows[:, b.COL_DEPTH],
        conic=rows[:, b.COL_A : b.COL_C + 1],
        radius=rows[:, b.COL_RX : b.COL_RY + 1],
        color=rows[:, b.COL_R : b.COL_BCH + 1],
        opacity=rows[:, b.COL_OPACITY],
        valid=valid,
    )


def compact_splats(splats, mask: jax.Array, budget: int):
    """compact_by_mask specialized to ProjectedSplats via ONE packed row
    array: 2 gathers (rows + valid) instead of 7 per-leaf gathers.

    NOTE pack_table zeroes opacity where ~valid; unpacking keeps that,
    which is harmless everywhere downstream (invalid splats never bin).
    """
    rows, valid = pack_splats(splats)
    (rows_c, valid_c), kept, dropped = compact_by_mask(
        (rows, valid), mask, budget
    )
    return unpack_splats(rows_c, valid_c), kept, dropped
