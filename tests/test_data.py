"""Data pipeline tests: Bayer packing, patch tiling, minibatching, baselines."""

import numpy as np

from noise_flow_tpu.data.patches import (
    PatchDataset,
    sample_indices_uniform,
    sample_indices_random,
)
from noise_flow_tpu.data.sidd import pack_raw, unpack_raw, parse_scene_dirname
from noise_flow_tpu.data.stats import bpd, calc_baselines, calc_pat_stats
from noise_flow_tpu.data.synthetic import S6_NLF, make_synthetic_samples


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    bayer = rng.uniform(size=(16, 20)).astype(np.float32)
    packed = pack_raw(bayer)
    assert packed.shape == (8, 10, 4)
    np.testing.assert_allclose(unpack_raw(packed), bayer)
    # RGGB order (ref:sidd_utils.py:740-743): ch0=(0,0), ch1=(0,1), ch2=(1,1), ch3=(1,0)
    assert packed[0, 0, 0] == bayer[0, 0]
    assert packed[0, 0, 1] == bayer[0, 1]
    assert packed[0, 0, 2] == bayer[1, 1]
    assert packed[0, 0, 3] == bayer[1, 0]


def test_parse_scene_dirname():
    iso, cam = parse_scene_dirname("0001_001_S6_00100_00060_3200_L")
    assert iso == 100.0 and cam == 2.0
    iso, cam = parse_scene_dirname("0199_009_G4_03200_00350_5500_N")
    assert iso == 3200.0 and cam == 4.0


def test_uniform_tiling_matches_reference_grid():
    ii, jj, n = sample_indices_uniform(64, 64, 32, 32)
    assert n == 4
    assert sorted(zip(ii.tolist(), jj.tolist())) == [
        (0, 0), (0, 32), (32, 0), (32, 32)]
    ii, jj = sample_indices_random(64, 64, 32, 32, 10,
                                   np.random.default_rng(0))
    assert len(ii) == 10
    assert (ii <= 32).all() and (jj <= 32).all()


def test_patch_dataset_and_batches():
    samples = make_synthetic_samples(n_images=2, h=64, w=64, iso=100)
    ds = PatchDataset(samples, 32, 4)
    assert len(ds) == 8
    assert ds.x.shape == (8, 32, 32, 4)
    mbs = list(ds.batches(4))
    assert len(mbs) == 2
    assert mbs[0]["_x"].shape == (4, 32, 32, 4)
    # batch-scalar compat: all cond entries equal the last patch's
    mb = next(ds.batches(8, batch_scalar_cond=True))
    assert np.all(mb["iso"] == mb["iso"][-1])


def test_baselines_on_synthetic_nlf_noise():
    """On noise truly generated as N(0, b1*y+b2) the NLF baseline must beat the
    Gaussian baseline, and both should be near the analytic entropy."""
    samples = make_synthetic_samples(n_images=4, h=128, w=128, iso=800, seed=1)
    ds = PatchDataset(samples, 32, 16)
    stats = calc_pat_stats(ds.x, ds.y)
    nll_gauss, nll_sdn = calc_baselines(ds.batches(16), stats["sc_in_vr"])
    assert nll_sdn < nll_gauss  # heteroscedastic model fits better
    # analytic per-patch entropy of the true model ~= E[0.5 log(2*pi*e*vr)]
    b1, b2 = S6_NLF[800]
    vr = b1 * ds.y + b2
    ent = float(np.sum(0.5 * np.log(2 * np.pi * np.e * vr)) / ds.x.shape[0])
    assert abs(nll_sdn - ent) / abs(ent) < 0.05
    # bpd conversion formula sanity (ref:sidd_utils.py:879-881)
    assert np.isclose(bpd(0.0, 1024.0, 4096), 10.0)


def test_welford_merge():
    from noise_flow_tpu.data.stats import welford_merge
    rng = np.random.default_rng(0)
    a = rng.normal(size=1000)
    b = rng.normal(loc=2.0, size=500)
    n1, m1, s1 = len(a), a.mean(), ((a - a.mean()) ** 2).sum()
    n2, m2, s2 = len(b), b.mean(), ((b - b.mean()) ** 2).sum()
    n, m, m2sum = welford_merge(n1, m1, s1, n2, m2, s2)
    full = np.concatenate([a, b])
    assert n == 1500
    np.testing.assert_allclose(m, full.mean())
    np.testing.assert_allclose(m2sum / n, full.var())


def test_kld_metrics():
    from noise_flow_tpu.utils.metrics import kl_div_3_data, calc_kldiv_mb
    rng = np.random.default_rng(0)
    p = rng.normal(0, 0.01, 20000)
    q = rng.normal(0, 0.01, 20000)
    r = rng.normal(0, 0.05, 20000)
    f_same, _, _ = kl_div_3_data(p, q, left_edge=-0.2, right_edge=0.2)
    f_diff, _, _ = kl_div_3_data(p, r, left_edge=-0.2, right_edge=0.2)
    assert f_same < f_diff

    samples = make_synthetic_samples(n_images=1, h=64, w=64, iso=800)
    from noise_flow_tpu.data.patches import PatchDataset
    ds = PatchDataset(samples, 32, 4)
    mb = next(ds.batches(4))
    # perfect "samples" = real noise -> KLD_NF == KLD_R == 0
    klds = calc_kldiv_mb(mb, mb["_x"], sc_sd=float(mb["_x"].std()), step=1)
    assert klds[3] == 0.0 and klds[2] == 0.0
    assert klds[0] > 0.0  # Gaussian model mismatch > 0


def test_kldiv_patch_set_mat_dumps(tmp_path):
    """kldiv_patch_set writes the reference's per-patch .mat artifact set
    (ref:sidd_utils.py:1015-1058) and returns the 4-model KLDs."""
    from scipy.io import loadmat

    from noise_flow_tpu.utils.metrics import (calc_kldiv_mb, kldiv_patch_set,
                                              save_vis_mb)

    rng = np.random.default_rng(0)
    b, h, w = 6, 8, 8
    y = rng.uniform(0.1, 0.8, (b, h, w, 4)).astype(np.float32)
    n = (0.01 * rng.standard_normal((b, h, w, 4))).astype(np.float32)
    mb = {"_x": n, "_y": y, "pid": np.arange(b),
          "nlf0": np.full((1,), 1e-4), "nlf1": np.full((1,), 1e-6),
          "fn": "0001_001|x"}
    samples = (0.01 * rng.standard_normal((b, h, w, 4))).astype(np.float32)

    sub = str(tmp_path / "scene")
    klds = kldiv_patch_set(0, mb, samples, sc_sd=0.01, subdir=sub,
                           save_mat=True)
    assert klds.shape == (4,) and np.isfinite(klds).all()
    assert klds[3] == 0.0  # real vs real
    for tag in ("y", "ng", "nl", "ns", "n", "xg", "xl", "xs", "x",
                "kl_ng", "kl_nl", "kl_ns"):
        path = tmp_path / "scene" / f"{tag}_0000.mat"
        assert path.exists(), tag
    assert loadmat(str(tmp_path / "scene" / "y_0000.mat"))["x"].shape == (16, 16)

    # calc_kldiv_mb with vis_dir writes into <vis_dir>/<scene>/
    out = calc_kldiv_mb(mb, samples, sc_sd=0.01, step=3,
                        vis_dir=str(tmp_path / "vis"))
    assert out.shape == (4,)
    assert (tmp_path / "vis" / "0001_001" / "y_0000.mat").exists()

    save_vis_mb(mb, str(tmp_path / "vis"))
    assert (tmp_path / "vis" / "vis_mb.npy").exists()
    assert (tmp_path / "vis" / "vis_mb.txt").read_text().startswith("fn=")
