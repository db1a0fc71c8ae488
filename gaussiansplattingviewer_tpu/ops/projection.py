"""Per-Gaussian projection: culling, EWA 3D->2D covariance, conic, SH color.

This is the TPU-native re-design of the reference vertex shader
(shaders/gau_vert.glsl) — one vectorized, differentiable function over all N
splats instead of 4N per-vertex shader invocations.  Everything is
elementwise / tiny-matrix math that XLA fuses onto the VPU; no Pallas needed
here (the hot loop is the tile blend, see raster kernels).

Semantics reproduced bit-for-bit where parity matters (SURVEY.md §7 "hard
parts"): the 1.3x fov clamp (gau_vert.glsl:99-104), the +0.3 px low-pass
(gau_vert.glsl:117-118), the |ndc| > 1.3 cull (gau_vert.glsl:142), the
3-sigma quad extent (gau_vert.glsl:174), the x1.2 scale inflate and
baseline-shift disparity of depth mode (gau_vert.glsl:151-153, 182-211).

Frame conventions:
  * view matrix V, projection P: math operators (p_clip = P @ V @ p_world),
    identical to the GL path after uniform-upload transposition.
  * image frame: x right, y DOWN, origin at the top-left pixel corner —
    i.e. the PNG the reference saves after its vertical flip
    (main.py:912-913).  The conic stored here is already in this y-down
    frame (cross term negated relative to the GL y-up frame).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.models.gaussians import GaussianData
from gaussiansplattingviewer_tpu.ops.sh import eval_sh_color
from gaussiansplattingviewer_tpu.utils.transforms import quat_to_rotmat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProjectedSplats:
    """Screen-space splats, the contract between projection and rasterization.

    All arrays have leading dim N (padded; ``valid`` masks real splats).
      mean2d: (N, 2) pixel-space center (x right, y down, pixel units).
      depth:  (N,) positive view-space distance (-z_view); smaller = nearer.
      conic:  (N, 3) inverse 2D covariance (A, B, C) in the y-down frame;
              power = -0.5*(A dx^2 + C dy^2) - B dx dy.
      radius: (N, 2) 3-sigma half-extents in pixels (quad half-size,
              gau_vert.glsl:174).
      color:  (N, 3) RGB (or disparity replicated to gray in DEPTH mode).
      opacity:(N,) splat opacity.
      valid:  (N,) bool — in-frustum, non-degenerate, non-padding.
    """

    mean2d: jax.Array
    depth: jax.Array
    conic: jax.Array
    radius: jax.Array
    color: jax.Array
    opacity: jax.Array
    valid: jax.Array


def compute_cov3d(scale: jax.Array, rot: jax.Array) -> jax.Array:
    """3D covariance Sigma = R diag(s^2) R^T for (N,3) scales, (N,4) wxyz
    quaternions — the math computed by gau_vert.glsl:73-93 (whose
    column-major mat3 constructor makes its M = S R^T, so Sigma = M^T M =
    R S^2 R^T, the standard 3DGS covariance)."""
    R = quat_to_rotmat(rot)  # (N, 3, 3)
    s2 = scale * scale  # (N, 3)
    return jnp.einsum(
        "nik,nk,njk->nij", R, s2, R, preferred_element_type=jnp.float32
    )


def compute_cov3d_packed(scale: jax.Array, rot: jax.Array):
    """Scalarized Sigma = R S^2 R^T: returns the 6 unique entries
    (s00, s01, s02, s11, s12, s22) as (N,) arrays.

    Pure elementwise math — XLA fuses the whole projection into one VPU
    pass, unlike the (N,3,3) einsum form whose tiny batched matmuls
    materialize intermediates (measured 100+ ms for 1M splats)."""
    s2x, s2y, s2z = (scale * scale).T
    w, x, y, z = rot[..., 0], rot[..., 1], rot[..., 2], rot[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s00 = s2x * r00 * r00 + s2y * r01 * r01 + s2z * r02 * r02
    s01 = s2x * r00 * r10 + s2y * r01 * r11 + s2z * r02 * r12
    s02 = s2x * r00 * r20 + s2y * r01 * r21 + s2z * r02 * r22
    s11 = s2x * r10 * r10 + s2y * r11 * r11 + s2z * r12 * r12
    s12 = s2x * r10 * r20 + s2y * r11 * r21 + s2z * r12 * r22
    s22 = s2x * r20 * r20 + s2y * r21 * r21 + s2z * r22 * r22
    return s00, s01, s02, s11, s12, s22


def compute_cov2d(
    mean_view: jax.Array,
    cov3d: jax.Array,
    view: jax.Array,
    focal: jax.Array,
    tan_fovx: jax.Array,
    tan_fovy: jax.Array,
) -> jax.Array:
    """EWA splatting: project 3D covariance to 2D screen space.

    Follows gau_vert.glsl:95-120: clamp the view-space ray to 1.3x the fov
    tangents, build the perspective Jacobian J, cov2d = J W Sigma W^T J^T
    with W the view rotation, then add the +0.3 px low-pass to the diagonal.

    cov3d: either a packed 6-tuple from compute_cov3d_packed or an
    (N, 3, 3) matrix array.
    Returns (N, 3): (cov_xx, cov_xy, cov_yy) in the GL frame (y up).
    """
    if not isinstance(cov3d, tuple):
        cov3d = (
            cov3d[..., 0, 0], cov3d[..., 0, 1], cov3d[..., 0, 2],
            cov3d[..., 1, 1], cov3d[..., 1, 2], cov3d[..., 2, 2],
        )
    tx, ty, tz = mean_view[..., 0], mean_view[..., 1], mean_view[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    # guard tz==0 (behind-plane splats are culled anyway)
    tz_safe = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    tx = jnp.clip(tx / tz_safe, -limx, limx) * tz_safe
    ty = jnp.clip(ty / tz_safe, -limy, limy) * tz_safe

    inv_tz = 1.0 / tz_safe
    inv_tz2 = inv_tz * inv_tz
    # J rows (2x3 effective Jacobian of perspective projection)
    j00 = focal * inv_tz
    j02 = -focal * tx * inv_tz2
    j11 = focal * inv_tz
    j12 = -focal * ty * inv_tz2

    # T = J @ W with W the (constant) view rotation: rows of T scalarized
    w00, w01, w02 = view[0, 0], view[0, 1], view[0, 2]
    w10, w11, w12 = view[1, 0], view[1, 1], view[1, 2]
    w20, w21, w22 = view[2, 0], view[2, 1], view[2, 2]
    t00 = j00 * w00 + j02 * w20
    t01 = j00 * w01 + j02 * w21
    t02 = j00 * w02 + j02 * w22
    t10 = j11 * w10 + j12 * w20
    t11 = j11 * w11 + j12 * w21
    t12 = j11 * w12 + j12 * w22

    s00, s01, s02, s11, s12, s22 = cov3d
    # cov2d = T Sigma T^T, expanded (elementwise; fuses with everything)
    cxx = (
        t00 * t00 * s00 + t01 * t01 * s11 + t02 * t02 * s22
        + 2.0 * (t00 * t01 * s01 + t00 * t02 * s02 + t01 * t02 * s12)
    ) + 0.3  # low-pass, gau_vert.glsl:117-118
    cyy = (
        t10 * t10 * s00 + t11 * t11 * s11 + t12 * t12 * s22
        + 2.0 * (t10 * t11 * s01 + t10 * t12 * s02 + t11 * t12 * s12)
    ) + 0.3
    cxy = (
        t00 * t10 * s00 + t01 * t11 * s11 + t02 * t12 * s22
        + (t00 * t11 + t01 * t10) * s01
        + (t00 * t12 + t02 * t10) * s02
        + (t01 * t12 + t02 * t11) * s12
    )
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def project(
    scene: GaussianData,
    view: jax.Array,
    proj: jax.Array,
    cam_pos: jax.Array,
    cfg: RenderConfig,
) -> ProjectedSplats:
    """Project a scene into screen space for rasterization.

    Args:
      scene: GaussianData pytree (device arrays, possibly padded).
      view: (4,4) view matrix, proj: (4,4) projection matrix (math
        convention), cam_pos: (3,) world camera position (for SH view dirs,
        gau_vert.glsl:215).
      cfg: static RenderConfig (mode, resolution, scale modifier, ...).
    """
    f32 = jnp.float32
    xyz = scene.xyz.astype(f32)
    n = xyz.shape[0]
    view = jnp.asarray(view, f32)
    proj = jnp.asarray(proj, f32)
    cam_pos = jnp.asarray(cam_pos, f32)
    mode = int(cfg.mode)

    # --- world -> view -> ndc (gau_vert.glsl:136-140)
    mean_view = xyz @ view[:3, :3].T + view[:3, 3]
    pv_h = jnp.concatenate(
        [mean_view, jnp.ones((n, 1), f32)], axis=-1
    )
    clip = pv_h @ proj.T
    w = clip[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = clip[..., :3] / w_safe[..., None]

    # --- culling (gau_vert.glsl:141-146 + hardware w>0 clip)
    lim = cfg.ndc_cull_limit
    in_frustum = jnp.all(jnp.abs(ndc) <= lim, axis=-1) & (w > 1e-8)
    not_padding = scene.opacity[..., 0] > 0.0

    # --- covariance (DEPTH mode inflates scale x1.2, gau_vert.glsl:151-156)
    scale_mult = cfg.scale_modifier * (
        cfg.depth_scale_inflate if mode == RenderMode.DEPTH else 1.0
    )
    cov3d = compute_cov3d_packed(
        scene.scale.astype(f32) * scale_mult, scene.rot.astype(f32)
    )
    htanx, htany = _htanfov_from_proj(proj)
    # focal in pixels: h / (2*tan(fovy/2)), exactly ref util.py:107-113;
    # the shader uses it for both focal_x and focal_y (gau_vert.glsl:159-160)
    focal = cfg.height / (2.0 * htany)
    cov2d = compute_cov2d(mean_view, cov3d, view, focal, htanx, htany)
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]

    det = cxx * cyy - cxy * cxy
    nondegenerate = det > 0.0  # gau_vert.glsl:167-169
    det_safe = jnp.where(nondegenerate, det, 1.0)
    inv_det = 1.0 / det_safe
    # conic in the y-DOWN image frame: flipping y negates the cross term
    # relative to gau_vert.glsl:172's (cyy, -cxy, cxx)/det
    conic = jnp.stack([cyy * inv_det, cxy * inv_det, cxx * inv_det], axis=-1)

    # --- pixel-space center & 3-sigma extents (gau_vert.glsl:174-177)
    W, H = float(cfg.width), float(cfg.height)
    mean_px = jnp.stack(
        [(ndc[..., 0] + 1.0) * 0.5 * W, (1.0 - ndc[..., 1]) * 0.5 * H],
        axis=-1,
    )
    radius = jnp.stack(
        [3.0 * jnp.sqrt(jnp.maximum(cxx, 0.0)),
         3.0 * jnp.sqrt(jnp.maximum(cyy, 0.0))],
        axis=-1,
    )

    # --- color
    if mode == RenderMode.DEPTH:
        color = _disparity_color(xyz, view, proj, cfg, ndc)
    else:
        sh_degree = mode if mode >= 0 else 0  # BILLBOARD/ball modes: DC only
        dir = xyz - cam_pos
        dir = dir / jnp.maximum(
            jnp.linalg.norm(dir, axis=-1, keepdims=True), 1e-12
        )
        color = eval_sh_color(
            scene.sh.astype(f32), dir, sh_degree, clamp=cfg.clamp_color
        )

    depth = -mean_view[..., 2]  # positive distance in front of the camera
    valid = in_frustum & nondegenerate & not_padding

    return ProjectedSplats(
        mean2d=mean_px,
        depth=depth,
        conic=conic,
        radius=radius,
        color=color,
        opacity=scene.opacity[..., 0].astype(f32),
        valid=valid,
    )


def _htanfov_from_proj(proj: jax.Array):
    """Recover (tan(fovx/2), tan(fovy/2)) from the projection matrix.
    The reference passes these as a host-computed uniform (util.py:107-113);
    deriving them from P keeps the device API to two matrices.
    proj[1,1] = 1/tan(fovy/2); proj[0,0] = 1/(aspect*tan(fovy/2))."""
    htany = 1.0 / proj[1, 1]
    htanx = 1.0 / proj[0, 0]
    return htanx, htany


def _disparity_color(xyz, view, proj, cfg: RenderConfig, ndc_left):
    """Per-splat stereo disparity as grayscale (gau_vert.glsl:182-211):
    project the splat center and the center shifted by ``baseline`` along
    world x; disparity = |x_ndc_l - x_ndc_r| / 2 (fraction of image width)."""
    f32 = jnp.float32
    shift = jnp.array([cfg.stereo_baseline, 0.0, 0.0], f32)
    p_r = xyz + shift
    mv_r = p_r @ view[:3, :3].T + view[:3, 3]
    clip_r = jnp.concatenate(
        [mv_r, jnp.ones_like(mv_r[..., :1])], axis=-1
    ) @ proj.T
    w_r = clip_r[..., 3]
    w_r = jnp.where(jnp.abs(w_r) < 1e-8, 1e-8, w_r)
    x_ndc_r = clip_r[..., 0] / w_r
    x_pix_l = (ndc_left[..., 0] + 1.0) * 0.5
    x_pix_r = (x_ndc_r + 1.0) * 0.5
    d = jnp.abs(x_pix_l - x_pix_r)
    return jnp.stack([d, d, d], axis=-1)
