"""Stride-interleaved row gathers: dodge the TPU monotone-query penalty.

Measured law (scripts/gatherloc.py, gatherdir.py, gatherdir2.py, v5e):
row-gather cost is ~22.4 ns/row for RANDOM query streams on >=190MB
sources but ~38.5 ns/row (1.7x) when the query stream is monotone with
small steps — and the penalty survives global reversal (descending
38.5) and coarse block shuffles (4096-blocks 38.6, 16-blocks 28.7).
What defeats it is NOT randomness but large per-query jumps: a stride
interleave j -> i = (j % A) * B + j // A (A=2048, runs stride B rows
apart) measures 21.7 ns/row — at the random-stream floor — and the
transpose that undoes it is ~free (21.8 with un-permute + consume).

This module wraps that trick: permute the query stream by the stride
interleave, gather, un-permute the rows with a reshape/transpose (plain
transposes are ~0.4 ms per 16x4M f32 on this backend; only minor-dim
reshapes pay relayout cost).  Exact — a pure permutation, bit-identical
to the plain gather — and differentiation-free (all call sites are
integer index plumbing inside custom_vjp fwd/bwd bodies).

Ascending-query sites in this codebase (all converted):
  * ops/fold.py segment extraction: ``in_ext[ends]`` / ``co_pack[co_idx]``
    (ends is non-decreasing by construction — 183 ms at garden before);
  * ops/fused.py ragged prefix/residual gathers: ``rows_sorted[src]``
    (src ascends tile by tile);
  * ops/binning.py pool keygen: ``table_src[ids]`` (ids from a STABLE
    partition argsort — ascending within every tier).
"""

from __future__ import annotations

import jax.numpy as jnp

_B_MIN = 2048  # minimum inter-query jump (what defeats the penalty)
_MIN_ROWS = 65_536  # below this the penalty delta is < ~1 ms: skip


def _grid(length: int) -> tuple[int, int]:
    """(A, B) with perm[j] = (j % A) * B + j // A: runs of A queries,
    each B index-positions past the previous.  B (the jump) is what
    defeats the small-step penalty, so it is pinned >= _B_MIN even for
    small arrays (A shrinks instead); at garden scale this reproduces
    the measured-fast (A=2048, B=2833) grid.  A is not required to be a
    power of two — XLA strength-reduces %/÷ by STATIC constants (only
    traced divisors are bit-serial on TPU)."""
    b = max(_B_MIN, -(-length // _B_MIN))
    a = -(-length // b)
    return a, b


def stride_perm_iota(length: int) -> jnp.ndarray:
    """The strided query order itself: perm[j] = (j % A) * B + j // A
    over the padded grid (A * B >= length).  Cheap elementwise arithmetic
    — callers that CONSTRUCT their queries (rather than permuting an
    existing index array) should evaluate them at these positions and
    undo with :func:`unpermute_rows` (then slice ``[:length]``)."""
    a, b = _grid(length)
    j = jnp.arange(a * b, dtype=jnp.int32)
    return (j % jnp.int32(a)) * jnp.int32(b) + j // jnp.int32(a)


def permute_queries(idx: jnp.ndarray) -> jnp.ndarray:
    """(L,) query array -> (A*B,) stride-interleaved query array."""
    (length,) = idx.shape
    a, b = _grid(length)
    pad = a * b - length
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    return idx.reshape(a, b).T.reshape(-1)


def unpermute_rows(rows: jnp.ndarray, length: int) -> jnp.ndarray:
    """(A*B, ...) gathered rows in strided order -> (length, ...) natural
    order.  The reshape/transpose pair is the measured-free un-permute."""
    a, b = _grid(length)
    if rows.ndim == 1:
        return rows.reshape(b, a).T.reshape(-1)[:length]
    tail = rows.shape[1:]
    return (
        rows.reshape((b, a) + tail)
        .transpose((1, 0) + tuple(range(2, 2 + len(tail))))
        .reshape((a * b,) + tail)[:length]
    )


def gather_rows_strided(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``src[idx]`` for a monotone (or mostly-monotone) query stream,
    executed in stride-interleaved order.  Bit-identical to ``src[idx]``."""
    (length,) = idx.shape
    if length < _MIN_ROWS:
        return src[idx]
    return unpermute_rows(src[permute_queries(idx)], length)
