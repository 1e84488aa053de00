"""Dataset bootstrap + bf16 DnCNN compute."""

import os

import jax
import numpy as np
import pytest

from noise_flow_tpu.data.bootstrap import (
    check_download_sidd,
    check_download_validation_blocks,
    sidd_present,
)


def test_sidd_present_detection(tmp_path):
    assert not sidd_present(str(tmp_path))
    scene = tmp_path / "0001_001_S6_00100_00060_3200_L"
    scene.mkdir()
    (scene / "0001_GT_RAW_010.MAT").write_bytes(b"x")
    assert sidd_present(str(tmp_path))
    # present -> returns immediately without network
    assert check_download_sidd(str(tmp_path)) == str(tmp_path)


def test_bootstrap_raises_with_instructions(tmp_path):
    with pytest.raises(FileNotFoundError, match="SIDD_Medium_Raw"):
        check_download_sidd(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="ValidationNoisyBlocksRaw"):
        check_download_validation_blocks(str(tmp_path))


def test_validation_blocks_present_ok(tmp_path):
    for n in ("ValidationNoisyBlocksRaw.mat", "ValidationGtBlocksRaw.mat"):
        (tmp_path / n).write_bytes(b"x")
    check_download_validation_blocks(str(tmp_path))  # no raise


def test_dncnn_bf16_compute_close_to_f32():
    from noise_flow_tpu.models.dncnn import dncnn_apply, dncnn_init

    params, state = dncnn_init(jax.random.PRNGKey(0), depth=5, filters=8)
    x = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 4)).astype(np.float32)
    out32, _ = dncnn_apply(params, state, x, train=False)
    out16, _ = dncnn_apply(params, state, x, train=False,
                           compute_dtype=jax.numpy.bfloat16)
    assert out16.dtype == jax.numpy.float32  # f32 accumulate/output
    scale = float(np.abs(np.asarray(out32)).max()) + 1e-6
    assert float(np.abs(np.asarray(out16) - np.asarray(out32)).max()) < 0.03 * scale


def test_dncnn_trainer_bf16_trains():
    from noise_flow_tpu.data.dncnn_data import synthetic_dncnn_data
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.dncnn_trainer import DnCNNTrainer

    clean, _, _ = synthetic_dncnn_data(n_images=2, h=256, w=256, batch_size=16)
    tr = DnCNNTrainer(depth=5, filters=8, lr=1e-3, mesh=make_mesh(8),
                      noise_source="gauss", dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    l0 = tr.train_epoch(clean, 16, rng)
    for e in range(3):
        rng, k = jax.random.split(rng)
        l1 = tr.train_epoch(clean, 16, k, shuffle_seed=e)
    assert np.isfinite(l1) and l1 < l0
