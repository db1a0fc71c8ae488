"""Unit tests for the Gaussian scene data model and PLY I/O."""

import numpy as np
import pytest

from gaussiansplattingviewer_tpu.models import (
    GaussianData,
    load_ply,
    naive_gaussian,
    random_scene,
    save_ply,
)
from gaussiansplattingviewer_tpu.models.gaussians import (
    activations,
    inverse_activations,
)


def test_naive_scene_matches_reference_values():
    # ref util_gau.py:25-60
    scene, bbox, center = naive_gaussian()
    assert len(scene) == 4
    assert scene.sh_dim == 3
    assert scene.sh_degree == 0
    np.testing.assert_allclose(scene.xyz[1], [1, 0, 0])
    np.testing.assert_allclose(scene.rot, np.tile([1, 0, 0, 0], (4, 1)))
    np.testing.assert_allclose(scene.scale[3], [0.03, 0.03, 0.2])
    np.testing.assert_allclose(scene.opacity, np.ones((4, 1)))
    # DC color inverse-activation: (c - 0.5) / 0.28209 (util_gau.py:50)
    np.testing.assert_allclose(scene.sh[0], (np.array([1, 0, 1]) - 0.5) / 0.28209)


def test_flat_roundtrip():
    scene, _, _ = naive_gaussian()
    flat = scene.flat()
    assert flat.shape == (4, 11 + 3)  # ref SSBO layout, gau_vert.glsl:28-32
    back = GaussianData.from_flat(flat, sh_dim=3)
    np.testing.assert_array_equal(back.xyz, scene.xyz)
    np.testing.assert_array_equal(back.sh, scene.sh)


def test_pad_to_is_inert():
    scene, _, _ = naive_gaussian()
    padded = scene.pad_to_multiple(128)
    assert len(padded) == 128
    assert np.all(padded.opacity[4:] == 0.0)
    np.testing.assert_array_equal(padded.xyz[:4], scene.xyz)


def test_activations_roundtrip():
    rng = np.random.default_rng(0)
    raw_s = rng.normal(size=(16, 3)).astype(np.float32)
    raw_o = rng.normal(size=(16, 1)).astype(np.float32)
    raw_r = rng.normal(size=(16, 4)).astype(np.float32)
    s, o, r = activations(raw_s, raw_o, raw_r)
    assert np.all(s > 0) and np.all((o > 0) & (o < 1))
    np.testing.assert_allclose(np.linalg.norm(r, axis=1), 1.0, rtol=1e-5)
    rs, ro, rr = inverse_activations(s, o, r)
    np.testing.assert_allclose(rs, raw_s, atol=1e-5)
    np.testing.assert_allclose(ro, raw_o, atol=1e-4)


def test_ply_roundtrip(tmp_path):
    scene = random_scene(100, sh_degree=3, seed=7)
    path = tmp_path / "scene.ply"
    save_ply(scene, path)
    loaded, bbox, center = load_ply(path)
    assert len(loaded) == 100
    assert loaded.sh_dim == 48  # deg-3: 16 coeffs x 3 channels
    np.testing.assert_allclose(loaded.xyz, scene.xyz, atol=1e-6)
    np.testing.assert_allclose(loaded.scale, scene.scale, rtol=1e-4)
    np.testing.assert_allclose(loaded.opacity, scene.opacity, atol=1e-5)
    np.testing.assert_allclose(loaded.sh, scene.sh, atol=1e-6)
    np.testing.assert_allclose(loaded.rot, scene.rot, atol=1e-6)
    np.testing.assert_allclose(bbox[0], scene.xyz.min(axis=0), atol=1e-6)


def test_ply_roundtrip_degree0(tmp_path):
    scene, _, _ = naive_gaussian()
    path = tmp_path / "naive.ply"
    save_ply(scene, path)
    loaded, _, _ = load_ply(path)
    np.testing.assert_allclose(loaded.sh, scene.sh, atol=1e-6)


def test_concat_select():
    a = random_scene(10, seed=0)
    b = random_scene(6, seed=1)
    c = a.concat(b)
    assert len(c) == 16
    sel = c.select(np.array([0, 12]))
    assert len(sel) == 2
    np.testing.assert_array_equal(sel.xyz[1], b.xyz[2])
