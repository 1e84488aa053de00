"""Integration: short training on synthetic NLF noise must beat the Gaussian
baseline and drive sd_z toward 1 (the reference's empirical correctness
criteria, SURVEY.md §4)."""

import os

import jax
import numpy as np
import pytest

from noise_flow_tpu.config import default_config
from noise_flow_tpu.data.patches import PatchDataset
from noise_flow_tpu.data.stats import calc_baselines, calc_pat_stats
from noise_flow_tpu.data.synthetic import make_synthetic_samples
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.parallel.mesh import make_mesh
from noise_flow_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def synth_data():
    train = make_synthetic_samples(n_images=4, h=64, w=64, iso=800, seed=0)
    test = make_synthetic_samples(n_images=2, h=64, w=64, iso=800, seed=9)
    ph = 16
    tr = PatchDataset(train, ph, 16)
    ts = PatchDataset(test, ph, 16)
    return tr, ts, ph


def test_sdn_flow_beats_gaussian_baseline(synth_data, tmp_path):
    tr, ts, ph = synth_data
    stats = calc_pat_stats(tr.x, tr.y)
    nll_gauss, nll_sdn = calc_baselines(ts.batches(16), stats["sc_in_vr"])

    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph, width=4,
                         lr=1e-2, epochs=50, epochs_full_valid=25,
                         n_batch_train=16, temp=1.0)
    flow = NoiseFlow((ph, ph, 4), cfg)
    mesh = make_mesh(8)
    trainer = Trainer(flow, cfg, mesh)

    logdir = str(tmp_path / "run")
    hist = trainer.fit(
        lambda: tr.batches(16, shuffle=True, seed=0, drop_remainder=True),
        lambda: ts.batches(16, drop_remainder=True),
        logdir, epochs=50, nll_gauss=nll_gauss, nll_sdn=nll_sdn,
        sc_sd=stats["sc_in_sd"], do_sampling=False, verbose=False)

    assert hist["test"][-1] < hist["test"][0]  # NLL decreasing
    assert hist["test"][-1] < nll_gauss  # beats Gaussian baseline
    # the flow should whiten the data: latent sd -> 1 (ref sd_z sanity metric)
    tail = open(os.path.join(logdir, "test.txt")).read().splitlines()[-1]
    sdz = float(tail.split("\t")[4])
    assert 0.8 < sdz < 1.25
    # logs written with reference columns
    assert os.path.exists(os.path.join(logdir, "train.txt"))
    head = open(os.path.join(logdir, "test.txt")).readline().rstrip("\n")
    assert head.split("\t") == ["epoch", "NLL", "NLL_G", "NLL_SDN", "sdz", "msg"]
    # checkpoints
    assert os.path.exists(os.path.join(logdir, "ckpt", "model.ckpt-best.npz"))


def test_checkpoint_resume(synth_data, tmp_path):
    tr, ts, ph = synth_data
    cfg = default_config(arch="unc", patch_height=ph, lr=1e-3, epochs=2,
                         n_batch_train=16)
    flow = NoiseFlow((ph, ph, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(8))
    logdir = str(tmp_path / "resume")
    trainer.fit(lambda: tr.batches(16, drop_remainder=True),
                lambda: ts.batches(16, drop_remainder=True),
                logdir, epochs=2, do_sampling=False, verbose=False)
    # the epoch-2 checkpoint is saved during the test phase, i.e. with exactly
    # the params that produced the epoch-2 test.txt NLL row (reference order:
    # test -> save -> train, ref:train_noise_flow.py:384-419)
    last_row = open(os.path.join(logdir, "test.txt")).read().splitlines()[-1]
    nll_at_ckpt = float(last_row.split("\t")[1])

    cfg2 = default_config(arch="unc", patch_height=ph, lr=1e-3, epochs=3,
                          n_batch_train=16, continue_training=True)
    flow2 = NoiseFlow((ph, ph, 4), cfg2)
    tr2 = Trainer(flow2, cfg2, make_mesh(8))
    from noise_flow_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
    last = latest_checkpoint(os.path.join(logdir, "ckpt"))
    assert last is not None
    tr2.params, tr2.state, tr2.opt_state, ep = load_checkpoint(
        last, tr2.params, tr2.state, tr2.opt_state)
    assert ep == 2
    nll_after, _ = tr2.eval_epoch(ts.batches(16, drop_remainder=True))
    np.testing.assert_allclose(nll_after, nll_at_ckpt, rtol=1e-5)


def test_sampling_epoch_kld(synth_data, tmp_path):
    """Sampling phase: samples' KLD vs real noise is finite; a flow trained a
    bit produces KLD_NF << KLD of an untrained wide Gaussian."""
    tr, ts, ph = synth_data
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph,
                         lr=1e-3, n_batch_train=16)
    flow = NoiseFlow((ph, ph, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(8))
    for _ in range(5):
        trainer.train_epoch(tr.batches(16, shuffle=True, drop_remainder=True))
    stats = calc_pat_stats(tr.x, tr.y)
    nll, sdz, kld = trainer.sample_epoch(
        ts.batches(16, drop_remainder=True), 1.0, jax.random.PRNGKey(0),
        sc_sd=stats["sc_in_sd"], fix_cam_iso=False)
    assert np.all(np.isfinite(kld))
    assert kld[3] == 0.0  # real vs real


def test_sample_epoch_vis_artifacts(tmp_path):
    """sample_epoch(vis_dir=...) writes the reference's per-patch .mat set
    under samples_epoch_####/samples_T/<scene>/ (ref:train_noise_flow.py:
    176-177 -> sidd_utils.py:995-1058)."""
    import glob as _glob

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.training.trainer import Trainer

    cfg = default_config(arch="unc|unc", patch_height=16, n_batch_train=8)
    flow = NoiseFlow((16, 16, 4), cfg)
    trainer = Trainer(flow, cfg)
    b = 8
    rng = np.random.default_rng(0)
    mb = {"_x": rng.standard_normal((b, 16, 16, 4)).astype(np.float32) * 0.01,
          "_y": rng.uniform(0.01, 0.9, (b, 16, 16, 4)).astype(np.float32),
          "pid": np.arange(b),
          "nlf0": np.full((b,), 5e-4, np.float32),
          "nlf1": np.full((b,), 2e-6, np.float32),
          "iso": np.full((b,), 100.0, np.float32),
          "cam": np.full((b,), 2.0, np.float32)}
    vis = tmp_path / "samples_epoch_0001" / "samples_0.6"
    trainer.sample_epoch([mb], 0.6, jax.random.PRNGKey(0), sc_sd=0.01,
                         vis_dir=str(vis))
    mats = _glob.glob(str(vis / "*" / "*.mat"))
    # reference set per patch: y, ng, nl, ns, n, xg, xl, xs, x + 3 kl scalars
    assert len(mats) >= 12, mats
    names = {m.split("/")[-1].split("_")[0] for m in mats}
    assert {"y", "ng", "nl", "ns", "n", "xg", "xl", "xs", "x", "kl"} <= names


def test_train_epoch_scan_equivalence(synth_data):
    """K steps per dispatch (lax.scan) must follow the same trajectory as the
    step-per-call loop: same params, same per-epoch metrics."""
    tr, ts, ph = synth_data
    # SGD: Adam's eps-scaled update direction amplifies the f32 rounding
    # noise of differently-fused programs on the BN-fed conv biases (whose
    # true gradient is exactly zero) to O(lr); SGD keeps the comparison at
    # rounding scale.
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph,
                         lr=1e-3, n_batch_train=16, optim="sgd")
    flow = NoiseFlow((ph, ph, 4), cfg)
    mesh = make_mesh(8)
    t1 = Trainer(flow, cfg, mesh)
    t2 = Trainer(flow, cfg, mesh)

    for _ in range(2):
        n1 = t1.train_epoch(tr.batches(16, shuffle=True, seed=3,
                                       drop_remainder=True))
        n2 = t2.train_epoch(tr.batches(16, shuffle=True, seed=3,
                                       drop_remainder=True),
                            steps_per_call=4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        t1.params, t2.params)
    np.testing.assert_allclose(n1[0], n2[0], rtol=1e-6)
    np.testing.assert_allclose(n1[1], n2[1], rtol=1e-6)
    # BN state followed the same trajectory too
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        t1.state, t2.state)


def test_device_resident_staged_equivalence(synth_data):
    """HBM-staged training (stage_dataset + on-device index gathers) must
    follow the same trajectory as streaming the same batches host-side —
    the identical permutation is forced by feeding pre-shuffled batches to
    the streaming trainer and the matching index order to the staged one."""
    tr, ts, ph = synth_data
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph,
                         lr=1e-3, n_batch_train=16, optim="sgd",
                         steps_per_call=2)
    flow = NoiseFlow((ph, ph, 4), cfg)
    mesh = make_mesh(1)
    t1 = Trainer(flow, cfg, mesh)
    t2 = Trainer(flow, cfg, mesh)

    batches = list(tr.batches(16, drop_remainder=True))
    n1 = t1.train_epoch(iter(batches), steps_per_call=2)

    n = t2.stage_dataset(iter(batches), "train")
    assert n == 16 * len(batches)
    # staged epoch with the identity permutation == the streamed order
    import numpy as _np
    orig_perm = _np.random.default_rng
    t2._train_epoch_staged.__func__  # noqa: B018 — sanity the attr exists

    class _Ident:
        def permutation(self, k):
            return _np.arange(k)

    _np.random.default_rng = lambda *a, **kw: _Ident()
    try:
        n2 = t2._train_epoch_staged(0)
    finally:
        _np.random.default_rng = orig_perm
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        t1.params, t2.params)
    np.testing.assert_allclose(n1[0], n2[0], rtol=1e-6)

    # staged eval == streamed eval over the same batches
    t2.stage_dataset(ts.batches(16, drop_remainder=True), "test")
    e1 = t1.eval_epoch(ts.batches(16, drop_remainder=True))
    cfg.n_batch_test = 16
    e2 = t2._eval_epoch_staged()
    np.testing.assert_allclose(e1[0], e2[0], rtol=1e-5)


def test_train_epoch_scan_ragged_tail(synth_data):
    """A batch count not divisible by steps_per_call falls back to single
    steps for the tail and still matches the sequential trajectory."""
    tr, ts, ph = synth_data
    cfg = default_config(arch="unc|unc", patch_height=ph, lr=1e-3,
                         n_batch_train=16, optim="sgd")
    flow = NoiseFlow((ph, ph, 4), cfg)
    mesh = make_mesh(8)
    t1 = Trainer(flow, cfg, mesh)
    t2 = Trainer(flow, cfg, mesh)
    batches = list(tr.batches(16, drop_remainder=True))[:7]  # 7 % 3 != 0
    n1 = t1.train_epoch(iter(batches))
    n2 = t2.train_epoch(iter(batches), steps_per_call=3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        t1.params, t2.params)
    np.testing.assert_allclose(n1[0], n2[0], rtol=1e-6)


def test_kernel_cache_bounded():
    """VERDICT r4 item 7: a batch-size sweep cannot grow the fused/one-shot
    kernel caches past _KERNEL_CACHE_MAX (FIFO eviction + compiled-step cache
    clear, like wrapper._jitted)."""
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=32,
                         use_pallas=True)
    flow = NoiseFlow((32, 32, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(1))
    assert trainer.use_fused
    for b in (3, 5, 7, 11, 13, 17, 19, 23):  # 8 distinct block sizes
        trainer._step_for_batch(b)
        trainer._fused_for_batch(b)
        assert len(trainer._step_cache) <= trainer._KERNEL_CACHE_MAX
        assert len(trainer._fused_cache) <= trainer._KERNEL_CACHE_MAX
    # newest entries survive, oldest evicted (FIFO)
    assert 23 in trainer._step_cache and 3 not in trainer._step_cache


def test_staged_smaller_than_batch_raises():
    """Advisor r4 (low): a staged set smaller than the batch size must fail
    with a clear error, not an opaque empty-concatenate."""
    ph = 16
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph,
                         n_batch_train=64, n_batch_test=64)
    flow = NoiseFlow((ph, ph, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(1))
    rng = np.random.default_rng(0)
    mb = {"_x": rng.normal(size=(8, ph, ph, 4)).astype(np.float32),
          "_y": rng.uniform(0.1, 0.9, (8, ph, ph, 4)).astype(np.float32),
          "nlf0": np.full((8,), 5e-4, np.float32),
          "nlf1": np.full((8,), 2e-6, np.float32),
          "iso": np.full((8,), 100.0, np.float32),
          "cam": np.full((8,), 2.0, np.float32)}
    n = trainer.stage_dataset([mb], "train")
    trainer.stage_dataset([mb], "test")
    assert n == 8
    with pytest.raises(ValueError, match="staged train set"):
        trainer._train_epoch_staged(0)
    with pytest.raises(ValueError, match="staged test set"):
        trainer._eval_epoch_staged()


def test_sample_epoch_on_device_kld_matches_host(synth_data, tmp_path):
    """sample_epoch's on-device KLD path vs the numpy/host path: identical
    flow samples (same key), so NLL/sd_z/KLD_NF agree tightly and KLD_R is
    exactly 0; the Gaussian/NLF comparison draws use different RNGs, so
    those columns agree statistically."""
    tr, ts, ph = synth_data
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph, width=4,
                         n_batch_train=16)
    flow = NoiseFlow((ph, ph, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(1))
    rng = jax.random.PRNGKey(7)
    args = dict(temp=1.0, sc_sd=0.02, fix_cam_iso=True, compute_kld=True)
    nll_d, sdz_d, kld_d = trainer.sample_epoch(
        ts.batches(16, drop_remainder=True), rng=rng, on_device_kld=True,
        **args)
    nll_h, sdz_h, kld_h = trainer.sample_epoch(
        ts.batches(16, drop_remainder=True), rng=rng, on_device_kld=False,
        **args)
    assert nll_d == pytest.approx(nll_h, rel=1e-5)
    assert sdz_d == pytest.approx(sdz_h, rel=1e-4)
    assert kld_d[3] == 0.0 and kld_h[3] == 0.0        # real vs real
    assert kld_d[2] == pytest.approx(kld_h[2], rel=1e-4, abs=1e-6)  # NF
    for j in (0, 1):  # Gaussian / camera-NLF: independent draws
        assert np.isfinite(kld_d[j]) and np.isfinite(kld_h[j])
        assert abs(kld_d[j] - kld_h[j]) < max(0.5 * kld_h[j], 0.1)
    # host path charged its numpy work to its own phase; device path not
    assert "sample" in trainer.timers.totals


def test_sample_epoch_staged_matches_host(synth_data, tmp_path):
    """The HBM-staged sampling phase (zero H2D) agrees with the host-batch
    path: same flow-sample key per batch => NLL/KLD_NF match tightly."""
    tr, ts, ph = synth_data
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph, width=4,
                         n_batch_train=16, n_batch_test=16)
    flow = NoiseFlow((ph, ph, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(1))
    trainer.stage_dataset(ts.batches(16, drop_remainder=True), "test")
    rng = jax.random.PRNGKey(11)
    nll_s, sdz_s, kld_s = trainer._sample_epoch_staged(1.0, rng, sc_sd=0.02)
    # host path over the identical (staged-order) batches
    nll_h, sdz_h, kld_h = trainer.sample_epoch(
        ts.batches(16, drop_remainder=True), 1.0, rng, sc_sd=0.02)
    assert nll_s == pytest.approx(nll_h, rel=1e-4)
    assert sdz_s == pytest.approx(sdz_h, rel=1e-3)
    assert kld_s[3] == 0.0
    assert kld_s[2] == pytest.approx(kld_h[2], rel=1e-3, abs=1e-5)
    # vis_dir leg writes the .mat artifact set from the staged data too
    vd = str(tmp_path / "vis")
    trainer._sample_epoch_staged(1.0, rng, sc_sd=0.02, vis_dir=vd,
                                 max_batches=2)
    import glob
    assert glob.glob(os.path.join(vd, "*", "*.mat"))
