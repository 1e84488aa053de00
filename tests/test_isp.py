"""ISP render pipeline unit tests."""

import numpy as np
import pytest

from noise_flow_tpu.data.isp import (
    _demosaic_bilinear,
    apply_ccm,
    apply_wb_gains,
    demosaic,
    flip_bayer,
    gamma_compress,
    process_sidd_image,
    rggb_to_bayer,
    stack_rggb,
)


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(0)
    bayer = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    assert np.allclose(rggb_to_bayer(stack_rggb(bayer)), bayer)


@pytest.mark.parametrize("pattern", [
    [[1, 2], [2, 3]], [[2, 1], [3, 2]], [[2, 3], [1, 2]], [[3, 2], [2, 1]],
])
def test_flip_bayer_reorients_to_rggb(pattern):
    """After flipping, the R site must land at (0,0)."""
    # build a bayer image where each CFA site has a distinct constant
    vals = {1: 0.9, 2: 0.5, 3: 0.1}  # R, G, B
    im = np.zeros((8, 8), np.float32)
    for di in range(2):
        for dj in range(2):
            im[di::2, dj::2] = vals[pattern[di][dj]]
    out = flip_bayer(im, pattern)
    assert out[0, 0] == vals[1]      # R
    assert out[0, 1] == vals[2]      # G
    assert out[1, 0] == vals[2]      # G
    assert out[1, 1] == vals[3]      # B


def test_flip_bayer_unknown_raises():
    with pytest.raises(ValueError):
        flip_bayer(np.zeros((4, 4)), [[9, 9], [9, 9]])


def test_demosaic_constant_image():
    rggb = np.full((8, 8, 4), 0.25, np.float32)
    rgb = demosaic(rggb)
    assert rgb.shape == (16, 16, 3)
    assert np.allclose(rgb, 0.25, atol=0.01)


def test_demosaic_bilinear_fallback_constant():
    bayer = np.full((16, 16), 0.5, np.float32)
    rgb = _demosaic_bilinear(bayer)
    assert rgb.shape == (16, 16, 3)
    assert np.allclose(rgb, 0.5, atol=1e-5)


def test_wb_and_ccm():
    rggb = np.full((4, 4, 4), 0.2, np.float32)
    out = apply_wb_gains(rggb, np.array([[0.5, 1.0, 0.25]]))
    assert np.allclose(out[..., 0], 0.4)
    assert np.allclose(out[..., 1], 0.2)
    assert np.allclose(out[..., 2], 0.2)
    assert np.allclose(out[..., 3], 0.8)

    rgb = np.ones((2, 2, 3), np.float32)
    eye = np.eye(3)
    assert np.allclose(apply_ccm(rgb, eye), rgb)


def test_gamma_monotone():
    x = np.linspace(0, 1, 11)
    g = gamma_compress(x)
    assert np.all(np.diff(g) > 0)
    assert g[-1] == pytest.approx(1.0)


def test_process_sidd_image_end_to_end():
    rng = np.random.default_rng(1)
    bayer = rng.uniform(0.05, 0.95, (32, 32)).astype(np.float32)
    wb = np.array([[0.6, 1.0, 0.7]])
    cst2 = np.linalg.inv(np.array([
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041]]))
    out = process_sidd_image(bayer, [[1, 2], [2, 3]], wb, cst2)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.uint8
    assert out.max() > 0
