"""Property tests for binning's scalar math tricks."""

import numpy as np
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.ops.binning import _floordiv_small


def test_floordiv_small_exact_exhaustive_small():
    """Exact over the full range the binning pipeline uses for slot/width."""
    a = np.arange(0, 64, dtype=np.int32)
    b = np.arange(1, 256, dtype=np.int32)
    A, B = np.meshgrid(a, b)
    got = np.asarray(_floordiv_small(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_array_equal(got, A // B)


def test_floordiv_small_exact_random_large():
    """Random (a, b) over the documented envelope: a < 2^20, b < 2^12."""
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**20, size=200_000).astype(np.int32)
    b = rng.integers(1, 2**12, size=200_000).astype(np.int32)
    got = np.asarray(_floordiv_small(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, a // b)
