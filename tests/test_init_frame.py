"""Initialization orchestration + full-frame sampling."""

import os

import numpy as np
import pytest

from noise_flow_tpu.data.initialization import (
    divide_parts,
    initialize_data_stats_baselines,
)
from noise_flow_tpu.data.synthetic import make_synthetic_samples


def test_divide_parts():
    assert divide_parts(10, 3) == [4, 3, 3]
    assert divide_parts(8, 4) == [2, 2, 2, 2]
    assert sum(divide_parts(23, 7)) == 23


def test_initialization_two_pass_and_cache(tmp_path):
    tr_s = make_synthetic_samples(3, 64, 64, iso=800, seed=0)
    ts_s = make_synthetic_samples(2, 64, 64, iso=800, seed=9)
    logdir = str(tmp_path)
    tr, ts, stats, g, s = initialize_data_stats_baselines(
        tr_s, ts_s, 16, 16, 16, logdir=logdir)
    assert len(tr) == 48 and len(ts) == 32
    assert stats["sc_in_sd"] > 0
    assert s < g  # NLF baseline beats Gaussian on heteroscedastic noise
    assert os.path.exists(os.path.join(logdir, "pat_stats.npy"))
    # second call loads the cache (mutate it to prove the load path)
    blob = np.load(os.path.join(logdir, "pat_stats.npy"),
                   allow_pickle=True).item()
    blob["nll_gauss"] = -12345.0
    np.save(os.path.join(logdir, "pat_stats.npy"), blob)
    _, _, _, g2, _ = initialize_data_stats_baselines(
        tr_s, ts_s, 16, 16, 16, logdir=logdir)
    assert g2 == -12345.0


@pytest.fixture(scope="module")
def trained_wrapper(tmp_path_factory):
    from noise_flow_tpu.cli.train import main as train_main
    from noise_flow_tpu.wrapper import NoiseFlowWrapper

    logdir = str(tmp_path_factory.mktemp("nf32"))
    train_main(["--synthetic_data", "2", "--epochs", "4", "--patch_height",
                "32", "--n_batch_train", "16", "--arch", "sdn5|unc|gain4|unc",
                "--lr", "1e-2", "--logdir", logdir, "--mesh", "8"])
    return NoiseFlowWrapper(logdir, 0.6, use_pallas=True)


def test_sample_noise_frame(trained_wrapper):
    """Full-frame synthesis: odd-sized frame, tiled + stitched + cropped."""
    frame = np.full((70, 100, 4), 0.3, np.float32)
    noise = trained_wrapper.sample_noise_frame(frame, 0, 0, iso=800, cam=2)
    assert noise.shape == (70, 100, 4)
    assert np.all(np.isfinite(noise))
    # noise everywhere, including the padded-then-cropped borders
    assert np.std(noise[-5:, -5:, :]) > 0
    assert np.std(noise[:5, :5, :]) > 0


def test_sample_noise_frame_accepts_batch_dim(trained_wrapper):
    frame = np.full((1, 64, 64, 4), 0.5, np.float32)
    noise = trained_wrapper.sample_noise_frame(frame, 0, 0, iso=100, cam=2)
    assert noise.shape == (64, 64, 4)
