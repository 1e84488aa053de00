"""Auxiliary subsystems: histograms, distributed helpers, profiling, plots."""

import os

import jax
import numpy as np

from noise_flow_tpu.data.histograms import (
    calc_hists,
    load_hists,
    merge_hists,
    plot_hists,
    save_hists,
)
from noise_flow_tpu.data.synthetic import make_synthetic_samples
from noise_flow_tpu.parallel.distributed import (
    global_batch,
    host_shard,
    merge_welford_shards,
)
from noise_flow_tpu.utils.profiling import PhaseTimers, device_trace


def test_histograms_roundtrip(tmp_path):
    samples = make_synthetic_samples(n_images=3, h=32, w=32, iso=800)
    h = calc_hists(samples)
    assert h["n_pix"] == 3 * 32 * 32 * 4
    assert h["noisy"].sum() > 0 and h["noise"].sum() > 0
    h2 = calc_hists(make_synthetic_samples(n_images=2, h=32, w=32, iso=100))
    merged = merge_hists(h, h2)
    assert merged["n_pix"] == h["n_pix"] + h2["n_pix"]
    np.testing.assert_allclose(merged["noise"], h["noise"] + h2["noise"])
    save_hists(str(tmp_path), h, h2)
    a, b = load_hists(str(tmp_path))
    np.testing.assert_allclose(a["noisy"], h["noisy"])
    plot_hists(a, b, str(tmp_path))
    assert os.path.exists(tmp_path / "hist_noise.png")


def test_host_shard_disjoint_exhaustive():
    items = list(range(23))
    shards = [host_shard(items, i, 4) for i in range(4)]
    flat = sorted(x for s in shards for x in s)
    assert flat == items
    assert all(len(set(a) & set(b)) == 0
               for i, a in enumerate(shards) for b in shards[i + 1:])


def test_global_batch_sharding():
    from noise_flow_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    local = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    g = global_batch(mesh, local)
    assert g["x"].shape == (16, 1)  # single-process: local == global
    assert len(g["x"].sharding.device_set) == 8


def test_welford_shard_merge_matches_full():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 2.0, 1000)
    shards = []
    for chunk in np.split(data, 8):
        shards.append({"n": len(chunk), "mean": chunk.mean(),
                       "m2": ((chunk - chunk.mean()) ** 2).sum()})
    merged = merge_welford_shards(shards)
    assert merged["n"] == 1000
    np.testing.assert_allclose(merged["mean"], data.mean(), rtol=1e-12)
    np.testing.assert_allclose(merged["m2"] / 1000, data.var(), rtol=1e-12)


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("tr"):
        pass
    with t.phase("ts"):
        pass
    with t.phase("tr"):
        pass
    assert t.counts["tr"] == 2
    line = t.line()
    assert "tr=" in line and "T=" in line


def test_device_trace_noop_and_real(tmp_path):
    with device_trace(None):
        pass  # no-op path
    with device_trace(str(tmp_path / "trace")):
        jax.numpy.zeros((8,)).block_until_ready()
    # trace directory created with profile artifacts
    assert os.path.exists(tmp_path / "trace")


def test_plots_from_training_run(tmp_path):
    """plot_nll / plot_kld / param evolution over a real (tiny) training run."""
    from noise_flow_tpu.analysis.plots import (
        kld_vs_temp_sweep,
        plot_kld,
        plot_kld_vs_temp,
        plot_nll,
        plot_param_evolution,
    )
    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.data.patches import PatchDataset
    from noise_flow_tpu.data.stats import calc_pat_stats
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    tr = PatchDataset(make_synthetic_samples(2, 64, 64, iso=800), 16, 16)
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=16, lr=1e-2,
                         n_batch_train=16, temp=1.0)
    flow = NoiseFlow((16, 16, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(8))
    logdir = str(tmp_path / "run")
    trainer.fit(lambda: tr.batches(16, drop_remainder=True),
                lambda: tr.batches(16, drop_remainder=True),
                logdir, epochs=6, nll_gauss=-100.0, nll_sdn=-120.0,
                do_sampling=True, verbose=False)

    p1 = plot_nll([logdir], out_path=str(tmp_path / "nll.png"))
    p2 = plot_kld([logdir], out_path=str(tmp_path / "kld.png"))
    p3 = plot_param_evolution(os.path.join(logdir, "ckpt"),
                              out_path=str(tmp_path / "params.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p)

    stats = calc_pat_stats(tr.x, tr.y)
    klds = kld_vs_temp_sweep(
        trainer, lambda: tr.batches(16, drop_remainder=True),
        [0.5, 1.0], jax.random.PRNGKey(0), stats["sc_in_sd"])
    assert klds.shape == (2, 4)
    p4 = plot_kld_vs_temp([0.5, 1.0], klds,
                          out_path=str(tmp_path / "kvt.png"))
    assert os.path.exists(p4)

    from noise_flow_tpu.analysis.plots import (
        load_cam_iso_nlf_all,
        plot_gain_vs_nlf,
    )
    prof = load_cam_iso_nlf_all("cam_iso_nlf_all.txt")
    assert set(prof) == {"IP", "GP", "S6", "N6", "G4"}
    assert all(b1 > 0 for v in prof.values() for _, b1 in v)
    p5 = plot_gain_vs_nlf(os.path.join(logdir, "ckpt"),
                          out_path=str(tmp_path / "gain_vs_nlf.png"))
    assert os.path.exists(p5)


def test_graphics_raster(tmp_path):
    from noise_flow_tpu.utils.graphics import save_image, save_raster, to_raster

    x = np.random.default_rng(0).uniform(0, 1, (10, 16, 16, 4)).astype(np.float32)
    g = to_raster(x, rescale=True)
    assert g.shape == (3 * 16, 4 * 16, 4)
    assert g.dtype == np.uint8
    save_raster(x, str(tmp_path / "r.png"))
    save_image(x[0], str(tmp_path / "i.png"))
    assert (tmp_path / "r.png").exists() and (tmp_path / "i.png").exists()


def test_compare_figures(tmp_path):
    """Paper-figure equivalents (analysis/compare.py) render from the TSV
    schema of a real run dir (ref:plotting/plot.py, plot_2.py, broken_ax.py)."""
    from noise_flow_tpu.analysis.compare import (
        compare_nll, compare_nll_broken, model_summary_panel, read_run)

    run = "experiments/sidd/smoke"
    data = read_run(run)
    assert "test" in data and "NLL" in data["test"]
    p1 = compare_nll([run, run], ["a", "b"], str(tmp_path / "cmp.png"))
    p2 = compare_nll_broken([run], None, str(tmp_path / "brk.png"),
                            (0.0, 1500.0), (-3100.0, 0.0))
    p3 = model_summary_panel(run, str(tmp_path / "panel.png"))
    import os
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_kldiv_batch_jax_matches_numpy():
    """On-device KLD histogram math (kldiv_batch_jax) reproduces the numpy
    reference path (get_histogram + kl_div_forward over every 5th patch)
    exactly, given identical noise arrays (VERDICT r4 item 4 parity)."""
    import jax.numpy as jnp

    from noise_flow_tpu.utils.metrics import (
        NOISE_BIN_EDGES, get_histogram, kl_div_forward, kldiv_batch_jax)

    rng = np.random.default_rng(3)
    shape = (12, 8, 8, 4)
    ng = rng.normal(0, 0.02, shape).astype(np.float32)
    nl = rng.normal(0, 0.01, shape).astype(np.float32)
    ns = rng.normal(0, 0.015, shape).astype(np.float32)
    n = rng.normal(0, 0.012, shape).astype(np.float32)

    sums, cnt = kldiv_batch_jax(jnp.asarray(ng), jnp.asarray(nl),
                                jnp.asarray(ns), jnp.asarray(n))
    want = np.zeros(4)
    idxs = range(0, shape[0], 5)
    for i in idxs:
        hn = get_histogram(n[i], bin_edges=NOISE_BIN_EDGES)[0]
        for j, p in enumerate((ng[i], nl[i], ns[i], n[i])):
            h = get_histogram(p, bin_edges=NOISE_BIN_EDGES)[0]
            want[j] += kl_div_forward(hn, h)
    assert cnt == len(list(idxs))
    np.testing.assert_allclose(np.asarray(sums), want, rtol=1e-5, atol=1e-7)
    # real-vs-real KLD is exactly zero
    assert float(np.asarray(sums)[3]) == 0.0
