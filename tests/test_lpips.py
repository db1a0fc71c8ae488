"""LPIPS optional-metric plumbing.

Pretrained weights are not fetchable in an air-gapped environment, so these
tests exercise the local-weights tier with a RANDOM state dict: the metric
must be 0 for identical inputs, positive for different ones, and symmetric —
properties of the architecture/normalization, not the calibration.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gaussiansplattingviewer_tpu.eval import lpips_distance  # noqa: E402
from gaussiansplattingviewer_tpu.eval.lpips_metric import (  # noqa: E402
    _ALEX_CHANNELS,
    _AlexLPIPS,
)


@pytest.fixture(scope="module")
def random_weights(tmp_path_factory):
    """torchvision-layout AlexNet features + lpips lin heads, random."""
    g = torch.Generator().manual_seed(0)
    sd = {}
    convs = {  # torchvision AlexNet.features conv indices
        0: (64, 3, 11), 3: (192, 64, 5), 6: (384, 192, 3),
        8: (256, 384, 3), 10: (256, 256, 3),
    }
    for idx, (co, ci, k) in convs.items():
        sd[f"features.{idx}.weight"] = (
            torch.randn(co, ci, k, k, generator=g) * 0.05
        )
        sd[f"features.{idx}.bias"] = torch.zeros(co)
    for i, c in enumerate(_ALEX_CHANNELS):
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1, generator=g)
    path = tmp_path_factory.mktemp("lpips") / "alex_rand.pth"
    torch.save(sd, str(path))
    return str(path)


def test_identical_is_zero(random_weights):
    img = np.random.default_rng(0).random((64, 64, 3)).astype(np.float32)
    assert lpips_distance(img, img, weights_path=random_weights) == 0.0


def test_different_positive_and_symmetric(random_weights):
    rng = np.random.default_rng(1)
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = rng.random((64, 64, 3)).astype(np.float32)
    dab = lpips_distance(a, b, weights_path=random_weights)
    dba = lpips_distance(b, a, weights_path=random_weights)
    assert dab > 0.0
    assert abs(dab - dba) < 1e-6


def test_closer_images_score_lower(random_weights):
    rng = np.random.default_rng(2)
    a = rng.random((64, 64, 3)).astype(np.float32)
    near = np.clip(a + 0.02 * rng.standard_normal(a.shape), 0, 1).astype(
        np.float32
    )
    far = rng.random((64, 64, 3)).astype(np.float32)
    m = _AlexLPIPS(random_weights)
    assert m(a, near) < m(a, far)


def test_missing_dep_raises_importerror():
    try:
        import lpips  # noqa: F401

        pytest.skip("lpips package installed")
    except ImportError:
        pass
    img = np.zeros((8, 8, 3), np.float32)
    with pytest.raises(ImportError):
        lpips_distance(img, img)


def test_grayscale_and_uint8_inputs(random_weights):
    g = (np.random.default_rng(3).random((64, 64)) * 255).astype(np.uint8)
    assert lpips_distance(g, g, weights_path=random_weights) == 0.0
