"""Gaussian scene data model as a JAX pytree.

Capability parity with the reference's ``GaussianData`` dataclass
(util_gau.py:6-22) and the ``naive_gaussian`` synthetic test scene
(util_gau.py:25-60), re-designed for XLA: the scene is a registered pytree of
device arrays, so it flows through ``jit`` / ``grad`` / ``shard_map``
untouched, and padding to a lane-aligned count is a first-class operation
(XLA wants static, 128-multiple shapes).

Layout convention (identical to the reference SSBO contract,
shaders/gau_vert.glsl:28-45):

  xyz     (N, 3)  float32   world-space means
  rot     (N, 4)  float32   unit quaternions, (w, x, y, z) order
  scale   (N, 3)  float32   per-axis standard deviations (post-exp activation)
  opacity (N, 1)  float32   in (0, 1) (post-sigmoid activation)
  sh      (N, K)  float32   SH coefficients, K = 3 * (deg+1)^2, interleaved
                            per-coefficient RGB: [c0.rgb, c1.rgb, ...]

Activations are applied at load time, like the reference (util_gau.py:114-121).
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianData:
    """A Gaussian splatting scene (pytree of arrays).

    Mirrors reference util_gau.py:6-22, with three additions that the TPU
    pipeline needs: ``pad_to`` (static lane-aligned shapes), ``mask`` support
    via zero-opacity padding, and pytree registration.
    """

    xyz: Array
    rot: Array
    scale: Array
    opacity: Array
    sh: Array

    def __len__(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_dim(self) -> int:
        """Total SH floats per Gaussian (ref util_gau.py:20-22)."""
        return self.sh.shape[-1]

    @property
    def sh_degree(self) -> int:
        """SH degree: sh_dim = 3*(deg+1)^2 (ref renderer_cuda.py:137)."""
        return int(round((self.sh_dim // 3) ** 0.5)) - 1

    def flat(self) -> Array:
        """Concatenate to (N, 11 + sh_dim) row-major — the reference SSBO
        layout (util_gau.py:13-15, gau_vert.glsl:28-32)."""
        parts = [self.xyz, self.rot, self.scale, self.opacity, self.sh]
        if any(isinstance(p, jax.Array) for p in parts):
            return jnp.concatenate([jnp.asarray(p) for p in parts], axis=-1)
        return np.ascontiguousarray(np.concatenate(parts, axis=-1))

    @classmethod
    def from_flat(cls, flat: Array, sh_dim: int) -> "GaussianData":
        assert flat.shape[-1] == 11 + sh_dim, (flat.shape, sh_dim)
        return cls(
            xyz=flat[:, 0:3],
            rot=flat[:, 3:7],
            scale=flat[:, 7:10],
            opacity=flat[:, 10:11],
            sh=flat[:, 11:],
        )

    def to_device(self) -> "GaussianData":
        return jax.tree.map(jnp.asarray, self)

    def to_host(self) -> "GaussianData":
        return jax.tree.map(np.asarray, self)

    def astype(self, dtype) -> "GaussianData":
        return jax.tree.map(lambda a: a.astype(dtype), self)

    def pad_to(self, n: int) -> "GaussianData":
        """Pad to exactly ``n`` Gaussians with inert splats.

        Padding splats have opacity 0 and sit at the origin with unit
        quaternion and tiny scale, so they are culled / contribute nothing.
        This keeps every downstream kernel shape static and lane-aligned.
        """
        cur = len(self)
        if cur == n:
            return self
        assert n > cur, f"pad_to({n}) smaller than current {cur}"
        pad = n - cur

        def _pad(a, fill_row):
            xp = jnp if isinstance(a, jax.Array) else np
            filler = xp.tile(
                xp.asarray(fill_row, dtype=a.dtype)[None, :], (pad, 1)
            )
            return xp.concatenate([a, filler], axis=0)

        return GaussianData(
            xyz=_pad(self.xyz, [0.0, 0.0, 0.0]),
            rot=_pad(self.rot, [1.0, 0.0, 0.0, 0.0]),
            scale=_pad(self.scale, [1e-9, 1e-9, 1e-9]),
            opacity=_pad(self.opacity, [0.0]),
            sh=_pad(self.sh, [0.0] * self.sh_dim),
        )

    def pad_to_multiple(self, m: int = 128) -> "GaussianData":
        n = len(self)
        return self.pad_to(-(-n // m) * m)

    def concat(self, other: "GaussianData") -> "GaussianData":
        assert self.sh_dim == other.sh_dim
        xp = jnp if isinstance(self.xyz, jax.Array) else np
        return jax.tree.map(lambda a, b: xp.concatenate([a, b], axis=0), self, other)

    def select(self, idx: Array) -> "GaussianData":
        return jax.tree.map(lambda a: a[idx], self)

    def aabb(self):
        """Axis-aligned bounding box (2,3) and centroid (3,), as the
        reference loader returns (util_gau.py:79-86)."""
        xyz = np.asarray(self.xyz)
        bbox = np.stack([xyz.min(axis=0), xyz.max(axis=0)])
        return bbox, xyz.mean(axis=0)


# Inverse of the SH DC basis constant; the reference converts plain RGB test
# colors to DC coefficients with (c - 0.5) / 0.28209 (util_gau.py:50).
_SH_C0 = 0.28209479177387814


def naive_gaussian() -> tuple[GaussianData, Array, Array]:
    """The 4-splat synthetic smoke-test scene (ref util_gau.py:25-60):
    one isotropic splat at the origin plus three axis-elongated splats on the
    +x/+y/+z axes colored red/green/blue (origin splat magenta).

    Returns (scene, bbox, center) matching the reference loader's signature
    (the reference returns (data, 0, 0); we return a real bbox/centroid).
    """
    xyz = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    )
    rot = np.tile(np.array([1, 0, 0, 0], dtype=np.float32), (4, 1))
    scale = np.array(
        [
            [0.03, 0.03, 0.03],
            [0.2, 0.03, 0.03],
            [0.03, 0.2, 0.03],
            [0.03, 0.03, 0.2],
        ],
        dtype=np.float32,
    )
    rgb = np.array(
        [[1, 0, 1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
    )
    sh_dc = (rgb - 0.5) / 0.28209  # exact reference constant (util_gau.py:50)
    opacity = np.ones((4, 1), dtype=np.float32)
    scene = GaussianData(xyz, rot, scale, opacity, sh_dc)
    bbox, center = scene.aabb()
    return scene, bbox, center


def activations(
    raw_scale: Array, raw_opacity: Array, raw_rot: Array
) -> tuple[Array, Array, Array]:
    """Parameter activations applied at load (ref util_gau.py:114-121):
    exp on scales, sigmoid on opacity, L2-normalize on quaternions."""
    xp = jnp if isinstance(raw_scale, jax.Array) else np
    scale = xp.exp(raw_scale)
    opacity = 1.0 / (1.0 + xp.exp(-raw_opacity))
    norm = xp.linalg.norm(raw_rot, axis=-1, keepdims=True)
    rot = raw_rot / norm
    return scale, opacity, rot


def inverse_activations(
    scale: Array, opacity: Array, rot: Array
) -> tuple[Array, Array, Array]:
    """Inverse of ``activations`` (used by save_ply to round-trip scenes)."""
    xp = jnp if isinstance(scale, jax.Array) else np
    eps = 1e-12
    raw_scale = xp.log(xp.maximum(scale, eps))
    op = xp.clip(opacity, eps, 1.0 - 1e-7)
    raw_opacity = xp.log(op) - xp.log1p(-op)
    return raw_scale, raw_opacity, rot
