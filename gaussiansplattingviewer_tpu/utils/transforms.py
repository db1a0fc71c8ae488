"""Quaternion / matrix helpers (pure numpy+jnp; replaces the reference's
PyGLM dependency).

Convention notes (verified against the reference's working GL path):
  * Matrices here are *math* matrices: ``p_view = V @ p_world`` with column
    vectors — the same operator the reference's GLSL shader applies
    (gau_vert.glsl:137) after util.set_uniform_mat4's transpose dance
    (util.py:340-351).
  * Quaternions are (w, x, y, z), like the reference throughout
    (util_gau.py:32-37, main.py:102-112).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q):
    """Unit quaternion (w,x,y,z) -> 3x3 rotation matrix.

    Matches ref main.py:102-112 (qvec2rotmat) / gau_vert.glsl:84-88 (which
    constructs the transpose column-major, i.e. the same math matrix).
    Works on (..., 4) stacked inputs with numpy or jax arrays.
    """
    xp = jnp if isinstance(q, jnp.ndarray) else np
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        xp.stack([r00, r01, r02], axis=-1),
        xp.stack([r10, r11, r12], axis=-1),
        xp.stack([r20, r21, r22], axis=-1),
    ]
    return xp.stack(rows, axis=-2)


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> quaternion (w,x,y,z), w >= 0.

    Eigen-decomposition method, as ref main.py:115-126 (rotmat2qvec);
    note the reference unpacks R.flat row-by-row, i.e. Ryx = R[0,1]."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = np.asarray(R).flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    q = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if q[0] < 0:
        q = -q
    return q


def normalize(v, axis=-1, eps: float = 0.0):
    xp = jnp if isinstance(v, jnp.ndarray) else np
    n = xp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = xp.maximum(n, eps)
    return v / n


def look_at(eye, center, up) -> np.ndarray:
    """Right-handed lookAt view matrix (math convention, p_view = V @ p).

    Semantics of glm.lookAtRH as used at ref main.py:321 and util.py:65-70:
    rows are (right, up', -forward), translation -R @ eye."""
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    f = normalize(center - eye)
    s = normalize(np.cross(f, up))
    u = np.cross(s, f)
    V = np.eye(4)
    V[0, :3] = s
    V[1, :3] = u
    V[2, :3] = -f
    V[:3, 3] = -V[:3, :3] @ eye
    return V.astype(np.float32)


def perspective(fovy: float, aspect: float, near: float, far: float) -> np.ndarray:
    """OpenGL-convention right-handed perspective projection matrix.

    Exactly ref util.py:72-80 (Camera.perspective): clip-space z in [-1, 1],
    view looks down -z."""
    f = 1.0 / np.tan(fovy / 2.0)
    P = np.zeros((4, 4))
    P[0, 0] = f / aspect
    P[1, 1] = f
    P[2, 2] = -(far + near) / (far - near)
    P[2, 3] = -(2.0 * far * near) / (far - near)
    P[3, 2] = -1.0
    return P.astype(np.float32)


def perspective_from_intrinsics(
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int, near: float = 0.1, far: float = 100.0,
) -> np.ndarray:
    """OpenGL-convention projection from pinhole intrinsics (COLMAP
    cameras.txt fx/fy/cx/cy — parsed by the reference at main.py:628-632
    but then discarded in favor of the default-lens fovy; this builder
    closes that gap so per-scene calibrations actually drive the render).

    Derivation (clip = P @ p_view, w_clip = -z_view, pixel frame y-DOWN
    with x_pix = (x_ndc+1)W/2 and y_pix = (1-y_ndc)H/2, the mapping
    ops/projection.py:234-236 applies):
      x_pix = fx * x/(-z) + cx  =>  P00 = 2fx/W,  P02 = 1 - 2cx/W
      y_pix = -fy * y/(-z) + cy =>  P11 = 2fy/H,  P12 = 2cy/H - 1
    A centered principal point (cx=W/2, cy=H/2) gives P02 = P12 = 0 and
    reduces exactly to perspective() with tan(fovy/2) = H/(2fy)."""
    W, H = float(width), float(height)
    P = np.zeros((4, 4))
    P[0, 0] = 2.0 * fx / W
    P[0, 2] = 1.0 - 2.0 * cx / W
    P[1, 1] = 2.0 * fy / H
    P[1, 2] = 2.0 * cy / H - 1.0
    P[2, 2] = -(far + near) / (far - near)
    P[2, 3] = -(2.0 * far * near) / (far - near)
    P[3, 2] = -1.0
    return P.astype(np.float32)


def translate4(tx: float, ty: float, tz: float) -> np.ndarray:
    T = np.eye(4, dtype=np.float32)
    T[0, 3], T[1, 3], T[2, 3] = tx, ty, tz
    return T


def rotate_quat_vec(q, v):
    """Apply quaternion (w,x,y,z) rotation to vector(s) v.

    Same formula as ref main.py:247-254 (apply_quat_to_vec)."""
    xp = jnp if isinstance(v, jnp.ndarray) else np
    qv = q[..., 1:]
    w = q[..., 0]
    uv = xp.cross(qv, v)
    uuv = xp.cross(qv, uv)
    return v + 2.0 * (w[..., None] * uv + uuv)
