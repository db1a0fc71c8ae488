"""Real spherical-harmonics color evaluation (degrees 0..3).

Same basis and hard-coded constants as the reference vertex shader
(shaders/gau_vert.glsl:3-18 definitions, :213-250 evaluation) and the INRIA
CUDA rasterizer it must match.  Layout: per-coefficient interleaved RGB,
``sh[..., 3*k : 3*k+3]`` is coefficient k (see models/gaussians.py).

Designed MXU-first: the basis is materialized as a (..., 16) matrix and the
color is one einsum against (..., 16, 3) coefficients, so XLA can fuse or
tile it instead of chasing 16 scalar FMAs per channel.
"""

from __future__ import annotations

import jax.numpy as jnp

# shaders/gau_vert.glsl:3-18 — bit-exact constants
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def sh_basis(dir: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH basis values for unit directions ``dir`` (..., 3).

    Returns (..., (degree+1)**2).  Signs follow gau_vert.glsl:224 exactly:
    band 1 is (-C1*y, +C1*z, -C1*x).
    """
    x, y, z = dir[..., 0], dir[..., 1], dir[..., 2]
    one = jnp.ones_like(x)
    basis = [SH_C0 * one]
    if degree >= 1:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        basis += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(basis, axis=-1)


def eval_sh_color(
    sh: jnp.ndarray,
    dir: jnp.ndarray,
    degree: int,
    clamp: bool = True,
) -> jnp.ndarray:
    """Evaluate RGB color from SH coefficients.

    Args:
      sh: (..., K) interleaved-RGB coefficients, K = 3*n_coeff.
      dir: (..., 3) unit view directions (ref gau_vert.glsl:215-216:
        normalize(gaussian_pos - cam_pos)).
      degree: SH bands to evaluate, 0..3.  Mirrors the render_mod gating
        (gau_vert.glsl:219-249): bands beyond ``degree`` or beyond the
        stored coefficients are ignored.
      clamp: clamp the result at 0 after the +0.5 offset, like the INRIA
        CUDA rasterizer's computeColorFromSH (the GL path leaves it
        unclamped until the 8-bit framebuffer write; see RenderConfig).

    Returns (..., 3) color.
    """
    n_coeff_stored = sh.shape[-1] // 3
    stored_degree = int(round(n_coeff_stored**0.5)) - 1
    deg = min(degree, stored_degree, 3)
    n_coeff = (deg + 1) ** 2
    basis = sh_basis(dir, deg)  # (..., n_coeff)
    coeffs = sh[..., : 3 * n_coeff].reshape(sh.shape[:-1] + (n_coeff, 3))
    color = jnp.einsum(
        "...k,...kc->...c", basis, coeffs, preferred_element_type=jnp.float32
    )
    color = color + 0.5  # gau_vert.glsl:250
    if clamp:
        color = jnp.maximum(color, 0.0)
    return color
