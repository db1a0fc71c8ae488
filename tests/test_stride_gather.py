"""ops/stride_gather must be a bit-identical permutation wrapper."""

import jax.numpy as jnp
import numpy as np

from gaussiansplattingviewer_tpu.ops.stride_gather import (
    _MIN_ROWS,
    gather_rows_strided,
    permute_queries,
    stride_perm_iota,
    unpermute_rows,
)


def test_stride_perm_is_bijection():
    for n in (1, 7, 2047, 2048, 2049, 300_000):
        p = np.asarray(stride_perm_iota(n))
        assert p.shape[0] >= n and p.shape[0] - n < 2048
        assert np.array_equal(np.sort(p), np.arange(p.shape[0]))


def test_permute_unpermute_roundtrip():
    rng = np.random.default_rng(0)
    for n in (5, 2048, 5000, 70_000):
        x = rng.standard_normal((n,)).astype(np.float32)
        xp = np.asarray(permute_queries(jnp.asarray(x)))
        # permuted stream evaluated at stride positions
        perm = np.asarray(stride_perm_iota(n))
        pad = np.concatenate([x, np.zeros(perm.shape[0] - n, np.float32)])
        np.testing.assert_array_equal(xp, pad[perm])
        np.testing.assert_array_equal(
            np.asarray(unpermute_rows(jnp.asarray(pad[perm]), n)), x
        )


def test_gather_rows_strided_matches_plain():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((1000, 7)).astype(np.float32)
    for n in (3, 2500, _MIN_ROWS + 5):
        idx = np.sort(rng.integers(0, 1000, n)).astype(np.int32)
        out = np.asarray(
            gather_rows_strided(jnp.asarray(src), jnp.asarray(idx))
        )
        np.testing.assert_array_equal(out, src[idx])
        # 1-D and 3-D sources too
        v = rng.standard_normal((1000,)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(
                gather_rows_strided(jnp.asarray(v), jnp.asarray(idx))
            ),
            v[idx],
        )
        t = rng.standard_normal((1000, 3, 2)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(
                gather_rows_strided(jnp.asarray(t), jnp.asarray(idx))
            ),
            t[idx],
        )
