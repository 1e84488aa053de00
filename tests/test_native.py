"""Native C++ patch pipeline: build, stream, and agree with the Python path."""

import shutil

import numpy as np
import pytest

from noise_flow_tpu.data.cache import load_cached_samples, write_cache_from_samples
from noise_flow_tpu.data.patches import PatchDataset
from noise_flow_tpu.data.synthetic import make_synthetic_samples

gxx = shutil.which("g++")
pytestmark = pytest.mark.skipif(gxx is None, reason="no C++ compiler")


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cache"))
    samples = make_synthetic_samples(n_images=3, h=64, w=64,
                                     isos=[100, 800, 3200], seed=0)
    write_cache_from_samples(samples, d)
    return d


def test_cache_roundtrip(cache_dir):
    samples = load_cached_samples(cache_dir)
    assert len(samples) == 3
    orig = make_synthetic_samples(n_images=3, h=64, w=64,
                                  isos=[100, 800, 3200], seed=0)
    np.testing.assert_allclose(samples[0]["noise"], orig[0]["noise"])
    assert samples[1]["iso"] == orig[1]["iso"]


def test_native_loader_builds_and_streams(cache_dir):
    from noise_flow_tpu.data.native import NativePatchLoader, ensure_built

    ensure_built()
    loader = NativePatchLoader(cache_dir, patch_size=16, batch_size=8,
                               n_patches_per_image=16, n_threads=4,
                               shuffle=False, seed=0)
    batches = list(loader)
    # 3 images x 16 patches = 48 -> 6 full batches of 8
    assert len(batches) == 6
    for mb in batches:
        assert mb["_x"].shape == (8, 16, 16, 4)
        assert np.all(np.isfinite(mb["_x"]))
        assert set(np.unique(mb["iso"])) <= {100.0, 800.0, 3200.0}


def test_native_matches_python_pipeline(cache_dir):
    """Unshuffled native stream must yield exactly the Python PatchDataset
    patches (same grid tiling, same centering)."""
    from noise_flow_tpu.data.native import NativePatchLoader

    samples = load_cached_samples(cache_dir)
    ds = PatchDataset(samples, 16, 16)
    loader = NativePatchLoader(cache_dir, patch_size=16, batch_size=16,
                               n_patches_per_image=16, n_threads=1,
                               shuffle=False, seed=0)
    native_x = np.concatenate([mb["_x"] for mb in loader])
    native_y = np.concatenate([mb["_y"] for mb in loader.epoch(0)] or
                              [np.zeros((0, 16, 16, 4), np.float32)])
    # n_threads=1, no shuffle -> deterministic image order = index order
    np.testing.assert_allclose(native_x, ds.x)


def test_native_reshuffles_per_epoch(cache_dir):
    from noise_flow_tpu.data.native import NativePatchLoader

    loader = NativePatchLoader(cache_dir, patch_size=16, batch_size=16,
                               n_patches_per_image=16, n_threads=1,
                               shuffle=True, seed=1)
    e1 = np.concatenate([mb["_x"] for mb in loader])
    e2 = np.concatenate([mb["_x"] for mb in loader.epoch()])
    assert e1.shape == e2.shape
    assert not np.allclose(e1, e2)  # different order
    # same multiset of patches
    np.testing.assert_allclose(np.sort(e1.reshape(len(e1), -1).sum(1)),
                               np.sort(e2.reshape(len(e2), -1).sum(1)),
                               rtol=1e-5)


def test_native_trains_a_flow(cache_dir):
    """End-to-end: native pipeline feeds the sharded trainer."""
    import jax

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.data.native import NativePatchLoader
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=16, lr=1e-2,
                         n_batch_train=16)
    flow = NoiseFlow((16, 16, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(8))
    loader = NativePatchLoader(cache_dir, patch_size=16, batch_size=16,
                               n_patches_per_image=16, n_threads=4,
                               shuffle=True, seed=0)
    nll0, _ = trainer.train_epoch(loader)
    for e in range(4):
        nll, _ = trainer.train_epoch(loader.epoch())
    assert nll < nll0


def test_cli_train_native_loader(tmp_path):
    """cli.train --native_loader --cache_dir end to end (synthetic data for
    stats, C++ loader streaming the training batches)."""
    from noise_flow_tpu.cli.train import main
    from noise_flow_tpu.data.cache import write_cache_from_samples
    from noise_flow_tpu.data.synthetic import make_synthetic_samples

    for split, seed in (("train", 0), ("test", 9)):
        samples = make_synthetic_samples(n_images=2, h=64, w=64, iso=100,
                                         seed=seed)
        write_cache_from_samples(samples, str(tmp_path / "cache" / split))
    logdir = tmp_path / "run"
    rc = main(["--synthetic_data", "2", "--epochs", "2",
               "--patch_height", "16", "--n_batch_train", "8",
               "--n_batch_test", "8", "--lr", "1e-2",
               "--native_loader", "--cache_dir", str(tmp_path / "cache"),
               "--logdir", str(logdir)])
    assert rc == 0
    rows = open(logdir / "train.txt").read().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs
    assert "nan" not in rows[1].split("\t")[2]
