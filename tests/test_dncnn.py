"""DnCNN model, metrics, trainer, and CLI tests."""

import os

import jax
import numpy as np
import pytest

from noise_flow_tpu.models.dncnn import dncnn_apply, dncnn_init, dncnn_num_params
from noise_flow_tpu.utils.image_metrics import psnr, ssim


def test_dncnn_shapes_and_params():
    params, state = dncnn_init(jax.random.PRNGKey(0), depth=9, filters=32,
                               image_channels=4)
    x = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 4)).astype(np.float32)
    out, new_state = dncnn_apply(params, state, x, train=True)
    assert out.shape == x.shape
    # conv params: 3*3*4*32 + 32 + 7*(3*3*32*32) ... sanity: > 60k
    assert dncnn_num_params(params) > 60000
    # BN state replaced by batch stats (Keras momentum 0.0)
    assert not np.allclose(new_state["bn"][0]["mean"], 0.0)


def test_dncnn_eval_uses_running_stats():
    params, state = dncnn_init(jax.random.PRNGKey(0), depth=5, filters=8)
    x = np.random.default_rng(1).uniform(0, 1, (4, 16, 16, 4)).astype(np.float32)
    _, st1 = dncnn_apply(params, state, x, train=True)
    out_a, st2 = dncnn_apply(params, st1, x, train=False)
    out_b, st3 = dncnn_apply(params, st1, x, train=False)
    np.testing.assert_allclose(out_a, out_b)  # eval is deterministic
    for a, b in zip(st1["bn"], st2["bn"]):
        np.testing.assert_allclose(a["mean"], b["mean"])  # state untouched


def test_psnr_known_value():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.1)
    assert psnr(a, b) == pytest.approx(20.0, abs=1e-6)
    assert psnr(a, a) == float("inf")


def test_ssim_identical_and_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64))
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = ssim(img, noisy)
    assert 0.0 < s < 0.95
    # less noise -> higher ssim
    slightly = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    assert ssim(img, slightly) > s


def test_ssim_matches_wang_formula_on_shifted():
    """Mean-shifted image: luminance term dominates; SSIM must be < 1 and
    symmetric."""
    img = np.full((32, 32), 0.5)
    shifted = np.full((32, 32), 0.6)
    s1 = ssim(img, shifted)
    s2 = ssim(shifted, img)
    assert s1 == pytest.approx(s2)
    assert 0.5 < s1 < 1.0


@pytest.mark.parametrize("source", ["gauss", "sdn", "camnlf"])
def test_dncnn_training_reduces_loss(source):
    from noise_flow_tpu.data.dncnn_data import synthetic_dncnn_data
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.dncnn_trainer import DnCNNTrainer

    clean, info, noisy = synthetic_dncnn_data(n_images=2, h=256, w=256,
                                              batch_size=16)
    trainer = DnCNNTrainer(depth=5, filters=8, lr=1e-3, mesh=make_mesh(8),
                           noise_source=source)
    rng = jax.random.PRNGKey(0)
    l0 = trainer.train_epoch(clean, 16, rng, shuffle_seed=0)
    for e in range(4):
        rng, k = jax.random.split(rng)
        l1 = trainer.train_epoch(clean, 16, k, shuffle_seed=e)
    assert l1 < l0


def test_dncnn_real_source_and_denoising_helps():
    from noise_flow_tpu.data.dncnn_data import synthetic_dncnn_data
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.dncnn_trainer import DnCNNTrainer

    clean, info, noisy = synthetic_dncnn_data(n_images=3, h=256, w=256,
                                              batch_size=16, isos=[3200])
    trainer = DnCNNTrainer(depth=5, filters=16, lr=5e-3, mesh=make_mesh(8),
                           noise_source="real")
    rng = jax.random.PRNGKey(0)
    for e in range(40):
        rng, k = jax.random.split(rng)
        trainer.train_epoch(clean, 16, k, noisy=noisy, shuffle_seed=e)
    den = np.clip(trainer.denoise(noisy[:16]), 0, 1)
    psnr_in = psnr(clean[:16], noisy[:16])
    psnr_out = psnr(clean[:16], den)
    assert psnr_out > psnr_in  # denoiser beats identity


def test_dncnn_device_resident_matches_per_batch():
    """HBM-staged training (index-gather per step, the tunnel-friendly
    production path) follows the identical trajectory as per-batch
    feeding, loss and params."""
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.dncnn_trainer import DnCNNTrainer

    rng0 = np.random.default_rng(0)
    clean = rng0.uniform(0.05, 0.9, (64, 32, 32, 4)).astype(np.float32)
    noisy = np.clip(clean + 0.02 * rng0.standard_normal(clean.shape)
                    .astype(np.float32), 0, 1)
    outs = {}
    for dev_res in (True, False):
        tr = DnCNNTrainer(depth=4, filters=8, lr=1e-3, mesh=make_mesh(1),
                          noise_source="real", seed=0)
        k = jax.random.PRNGKey(5)
        losses = [tr.train_epoch(clean, 32, k, noisy=noisy, shuffle_seed=1,
                                 device_resident=dev_res) for _ in range(2)]
        outs[dev_res] = (losses, tr.params)
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][1]),
                    jax.tree_util.tree_leaves(outs[False][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dncnn_cli_end_to_end(tmp_path):
    from noise_flow_tpu.cli.test_dncnn import main as test_main
    from noise_flow_tpu.cli.train_dncnn import main as train_main

    save_dir = str(tmp_path / "DnCNN_Gauss")
    rc = train_main(["--model", "DnCNN_Gauss", "--synthetic_data", "2",
                     "--max_epoch", "2", "--batch_size", "16",
                     "--depth", "5", "--filters", "8",
                     "--save_dir", save_dir, "--mesh", "8",
                     "--cam_iso_nlf", "cam_iso_nlf.txt"])
    assert rc == 0
    assert os.path.exists(os.path.join(save_dir, "log.csv"))

    result_dir = str(tmp_path / "results")
    rc = test_main(["--model_name", "DnCNN_Gauss", "--model_dir", save_dir,
                    "--result_dir", result_dir, "--depth", "5",
                    "--filters", "8", "--synthetic"])
    assert rc == 0
    out = os.path.join(result_dir, "DnCNN_Gauss", "SIDD")
    assert os.path.exists(os.path.join(out, "psnr.txt"))
    assert os.path.exists(os.path.join(out, "ssim.txt"))
    p = float(np.loadtxt(os.path.join(out, "psnr.txt")))
    assert np.isfinite(p)


def test_dncnn_nf_source(tmp_path):
    """NoiseFlow generator fused into the DnCNN train step."""
    from noise_flow_tpu.cli.train import main as nf_train_main
    from noise_flow_tpu.data.dncnn_data import synthetic_dncnn_data
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.dncnn_trainer import DnCNNTrainer
    from noise_flow_tpu.wrapper import NoiseFlowWrapper

    nf_dir = str(tmp_path / "nf")
    nf_train_main(["--synthetic_data", "2", "--epochs", "3",
                   "--patch_height", "32", "--n_batch_train", "16",
                   "--arch", "sdn5|unc|gain4|unc", "--lr", "1e-2",
                   "--logdir", nf_dir, "--mesh", "8"])
    nf = NoiseFlowWrapper(nf_dir)
    clean, info, _ = synthetic_dncnn_data(n_images=2, h=256, w=256,
                                          batch_size=16)
    trainer = DnCNNTrainer(depth=5, filters=8, mesh=make_mesh(8),
                           noise_source="nf",
                           noise_flow=(nf.flow, nf.params, nf.state))
    loss = trainer.train_epoch(clean, 16, jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_stage_key_detects_change():
    """Advisor r4 (low): HBM staging cache keys on content, not id() —
    a recycled id or an in-place edit must restage."""
    from noise_flow_tpu.training.dncnn_trainer import _stage_key

    rng = np.random.default_rng(0)
    a = rng.uniform(size=(16, 8, 8)).astype(np.float32)
    k1 = _stage_key(a)
    assert k1 == _stage_key(a.copy())  # content-identical -> same key
    b = a.copy()
    b[0, 0, 0] += 1.0  # in-place edit in the sampled region
    assert _stage_key(b) != k1
    c = rng.uniform(size=(16, 8, 8)).astype(np.float32)
    assert _stage_key(c) != k1
    assert _stage_key(None) is None
