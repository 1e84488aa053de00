"""Inference wrapper + CLI end-to-end on synthetic data."""

import os

import numpy as np
import pytest

from noise_flow_tpu.cli.sample import main as sample_main
from noise_flow_tpu.cli.train import main as train_main
from noise_flow_tpu.wrapper import NoiseFlowWrapper


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    logdir = str(tmp_path_factory.mktemp("cli_run"))
    rc = train_main([
        "--synthetic_data", "3", "--epochs", "12", "--patch_height", "16",
        "--n_batch_train", "16", "--n_batch_test", "16", "--lr", "1e-2",
        "--arch", "sdn5|unc|gain4|unc", "--width", "4",
        "--epochs_full_valid", "6", "--logdir", logdir, "--mesh", "8",
    ])
    assert rc == 0
    return logdir


def test_train_cli_outputs(trained_dir):
    for fn in ("hps.txt", "model_vars.txt", "train.txt", "test.txt",
               "total_time.txt"):
        assert os.path.exists(os.path.join(trained_dir, fn)), fn
    assert os.path.exists(os.path.join(trained_dir, "ckpt",
                                       "model.ckpt-best.npz"))
    # hps.txt round-trips through the wrapper's loader
    from noise_flow_tpu.config import load_hps
    cfg = load_hps(os.path.join(trained_dir, "hps.txt"))
    assert cfg.arch == "sdn5|unc|gain4|unc"
    assert cfg.patch_height == 16


def test_wrapper_sample(trained_dir):
    nf = NoiseFlowWrapper(trained_dir, sampling_temperature=0.6)
    clean = np.full((8, 16, 16, 4), 0.4, np.float32)
    noise = nf.sample_noise_nf(clean, 0.0, 0.0, iso=100, cam=2)
    assert noise.shape == clean.shape
    assert np.all(np.isfinite(noise))
    # temperature contracts the distribution
    noise_hot = nf.sample_noise_nf(clean, 0.0, 0.0, iso=100, cam=2, temp=1.0)
    assert np.std(noise) < np.std(noise_hot)
    # two calls draw different noise (internal rng advances)
    n2 = nf.sample_noise_nf(clean, 0.0, 0.0, iso=100, cam=2)
    assert not np.allclose(noise, n2)


def test_wrapper_shape_error(trained_dir):
    nf = NoiseFlowWrapper(trained_dir)
    with pytest.raises(ValueError, match="batch_clean"):
        nf.sample_noise_nf(np.zeros((2, 8, 8, 4), np.float32), 0, 0, 100, 2)


def test_sample_cli_synthetic(trained_dir, tmp_path):
    out = str(tmp_path / "samples")
    rc = sample_main(["--model_path", trained_dir, "--synthetic",
                      "--out_dir", out, "--n_pat", "2", "--temp", "0.6"])
    assert rc == 0
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    mats = [f for f in os.listdir(out) if f.endswith(".mat")]
    assert len(pngs) == 6 and len(mats) == 6  # 3 scenes x 2 patches


def test_wrapper_spatial_frame_sampling(trained_dir):
    """Spatially sharded full-frame sampling (SURVEY §2.6 optional row): the
    frame's H axis is sharded over the mesh; XLA partitions the 3x3 coupling
    convs with halo exchanges. Values must match the unsharded run of the
    same frame-sized flow (same key => same latent draw)."""
    import jax

    from noise_flow_tpu.parallel.mesh import make_mesh

    nf8 = NoiseFlowWrapper(trained_dir, sampling_temperature=1.0, seed=7)
    nf1 = NoiseFlowWrapper(trained_dir, sampling_temperature=1.0, seed=7)
    frame = np.full((128, 48, 4), 0.3, np.float32)
    frame[40:80] = 0.6
    n8 = nf8.sample_noise_frame_spatial(frame, 0.0, 0.0, 100, 2,
                                        mesh=make_mesh(8))
    n1 = nf1.sample_noise_frame_spatial(frame, 0.0, 0.0, 100, 2,
                                        mesh=make_mesh(1))
    assert n8.shape == frame.shape
    assert np.all(np.isfinite(n8))
    np.testing.assert_allclose(n8, n1, rtol=1e-4, atol=1e-5)
    # whole-frame receptive field: no 16px tile seams (smoke: std sane)
    assert 0.0 < np.std(n8) < 1.0


def test_train_cli_device_resident(tmp_path):
    """--device_resident_data end-to-end: staged HBM training through the
    CLI produces the same artifact set and a converging run (mesh must be
    1 — staging is single-device)."""
    logdir = str(tmp_path / "devres_run")
    rc = train_main([
        "--synthetic_data", "3", "--epochs", "8", "--patch_height", "16",
        "--n_batch_train", "16", "--n_batch_test", "16", "--lr", "1e-2",
        "--arch", "sdn5|unc|gain4|unc", "--width", "4", "--mesh", "1",
        "--steps_per_call", "2", "--device_resident_data",
        "--epochs_full_valid", "4", "--logdir", logdir,
    ])
    assert rc == 0
    for fn in ("train.txt", "test.txt"):
        assert os.path.exists(os.path.join(logdir, fn)), fn
    rows = open(os.path.join(logdir, "train.txt")).read().splitlines()
    first, last = float(rows[1].split("\t")[1]), float(rows[-1].split("\t")[1])
    assert last < first  # NLL falls


def test_kld_sweep_cli(trained_dir, tmp_path):
    """KLD-vs-temperature sweep CLI end-to-end: per-(cam, iso) TSV rows with
    finite KLDs for every requested temperature (BASELINE config 4)."""
    from noise_flow_tpu.cli.kld_sweep import main as kld_main

    logdir = str(tmp_path / "kld")
    rc = kld_main(["--model_dir", trained_dir, "--synthetic_data", "2",
                   "--iso", "100", "--temps", "0.5,1.0",
                   "--n_batch", "16", "--n_patches_per_image", "16",
                   "--max_batches_per_group", "1", "--logdir", logdir])
    assert rc == 0
    rows = open(os.path.join(logdir, "kld_vs_temp.txt")).read().splitlines()
    assert rows[0].split("\t") == ["cam", "iso", "temp", "KLD_G", "KLD_NLF",
                                   "KLD_NF", "KLD_R"]
    body = np.asarray([[float(v) for v in r.split("\t")] for r in rows[1:]])
    assert body.shape[0] == 2  # one (cam, iso) group x two temps
    assert np.all(np.isfinite(body))
    assert set(body[:, 2]) == {0.5, 1.0}


def test_cli_parity_tail_flags(tmp_path):
    """--gain_init and the sampling-gating trio (ref:ArgParser.py:53,132-134,
    162) parse, reach Config, and round-trip through the hps.txt dump."""
    from noise_flow_tpu.cli.args import parse_config
    from noise_flow_tpu.config import load_hps, save_hps

    args, cfg = parse_config([
        "--gain_init", "-3.5", "--epochs_full_sample", "25",
        "--sample_epoch_start", "5", "--sample_epoch_end", "10"])
    assert cfg.gain_init == -3.5
    assert cfg.epochs_full_sample == 25
    assert cfg.sample_epoch_start == 5 and cfg.sample_epoch_end == 10
    path = str(tmp_path / "hps.txt")
    save_hps(path, cfg, ["l0"], 7)
    cfg2 = load_hps(path)
    assert cfg2.gain_init == -3.5
    assert cfg2.epochs_full_sample == 25
    assert cfg2.sample_epoch_start == 5 and cfg2.sample_epoch_end == 10


def test_gain_init_flag_feeds_param_inits():
    """The CLI gain value lands in the sdn2-family initial parameters
    (ref:cond_utils.py gain init from hps.gain_init)."""
    from noise_flow_tpu.cli.args import parse_config
    from noise_flow_tpu.models import cond_params as cp

    _, cfg = parse_config(["--gain_init", "-2.0"])
    p = cp.sdn2_init(cfg.gain_init)
    _, cfg_d = parse_config([])
    p_d = cp.sdn2_init(cfg_d.gain_init)
    assert not np.allclose(np.asarray(p["gain"]), np.asarray(p_d["gain"]))


def test_stats_cache_fingerprint(tmp_path):
    """Advisor r4 (medium): cached pat-stats/baselines must invalidate when
    the patch-extraction config changes, not key on cache_dir existence."""
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    common = ["--synthetic_data", "3", "--patch_height", "16",
              "--n_batch_train", "16", "--n_batch_test", "16",
              "--cache_dir", cache,
              "--calc_pat_stats_and_baselines_only"]
    rc = train_main(common + ["--logdir", str(tmp_path / "r1")])
    assert rc == 0
    npz_path = os.path.join(cache, "pat_stats_baselines.npz")
    z = dict(np.load(npz_path))
    assert "fingerprint" in z
    # poison the cached baseline but keep the fingerprint: a same-config
    # rerun must LOAD it (proving the cache path is taken)...
    z["nll_gauss"] = np.float64(-123456.0)
    np.savez(npz_path, **z)
    rc = train_main(common + ["--logdir", str(tmp_path / "r2")])
    assert rc == 0
    out2 = np.load(str(tmp_path / "r2" / "pat_stats.npy"),
                   allow_pickle=True).item()
    assert out2["nll_gauss"] == -123456.0
    # ...while a changed extraction config must RECOMPUTE despite the cache
    rc = train_main([a if a != "16" else a for a in common]
                    [:2] + ["--patch_height", "8", "--n_batch_train", "16",
                            "--n_batch_test", "16", "--cache_dir", cache,
                            "--calc_pat_stats_and_baselines_only",
                            "--logdir", str(tmp_path / "r3")])
    assert rc == 0
    out3 = np.load(str(tmp_path / "r3" / "pat_stats.npy"),
                   allow_pickle=True).item()
    assert out3["nll_gauss"] != -123456.0


def test_spatial_frame_sharding_compiles_with_halo(trained_dir):
    """VERDICT r4 item 6: the spatially-sharded full-frame sample must
    actually partition — the optimized HLO for the 8-device mesh contains
    collective-permute ops (XLA's halo exchange for the 3x3 coupling convs
    across shard boundaries)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.parallel.mesh import make_mesh

    nf = NoiseFlowWrapper(trained_dir, sampling_temperature=1.0, seed=7)
    mesh = make_mesh(8)
    h, w = 128, 48
    xp = np.full((1, h, w, 4), 0.3, np.float32)
    flow = NoiseFlow(xp.shape[1:], nf.cfg)
    sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    cond = {"clean": jax.device_put(jnp.asarray(xp), sh),
            "nlf0": jnp.zeros((1,)), "nlf1": jnp.zeros((1,)),
            "iso": jnp.full((1,), 100.0), "cam": jnp.full((1,), 2.0)}

    def fn(params, state, rng, cond):
        return flow.sample(params, state, rng, cond, temp=1.0, batch=1,
                           train=True)

    hlo = jax.jit(fn).lower(nf.params, nf.state, jax.random.PRNGKey(0),
                            cond).compile().as_text()
    assert hlo.count("collective-permute") > 0, "no halo exchange in HLO"
