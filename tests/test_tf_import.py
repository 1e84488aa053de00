"""Golden parity vs the reference's shipped TF checkpoint.

The reference publishes its best trained model at
``/root/reference/models/NoiseFlow/ckpt/model.ckpt.best`` (restored by
ref:borealisflows/NoiseFlowWrapper.py:43,77). These tests import the real
weights into the JAX model and pin its behavior:

- every checkpoint variable maps onto the pytree (143 vars, 2433 trainables
  matching ref:models/NoiseFlow/hps.txt ``num_params``),
- the TFP fill_triangular LU-vector conversion is exact,
- NLL on a deterministic batch is recorded as a golden constant,
- sampled noise statistics land on the camera-NLF prediction for the
  training condition (S6, ISO 100; ref:cam_iso_nlf.txt row S6_00100).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF_MODEL = "/root/reference/models/NoiseFlow"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_MODEL, "ckpt", "model.ckpt.best.index")),
    reason="reference checkpoint not available")


@pytest.fixture(scope="module")
def wrapper():
    tf = pytest.importorskip("tensorflow")  # noqa: F841 — importer needs it
    from noise_flow_tpu.wrapper import NoiseFlowWrapper
    return NoiseFlowWrapper(REF_MODEL, sampling_temperature=0.6)


def test_fill_triangular_ordering():
    """Matches the documented TFP fill_triangular examples
    (ref:matrix_param.py:31-97 relies on this ordering)."""
    from noise_flow_tpu.utils.tf_import import (
        fill_triangular_np, strict_tri_to_tfp_vec, tfp_vec_to_strict_tri)

    v = np.arange(1.0, 7.0)
    np.testing.assert_array_equal(
        fill_triangular_np(v, upper=False),
        np.array([[4, 0, 0], [6, 5, 0], [3, 2, 1]], np.float64))
    np.testing.assert_array_equal(
        fill_triangular_np(v, upper=True),
        np.array([[1, 2, 3], [0, 5, 6], [0, 0, 4]], np.float64))
    # roundtrip through the strict-tri embedding both ways
    for upper in (False, True):
        full = tfp_vec_to_strict_tri(v.astype(np.float32), 4, upper)
        assert full.shape == (4, 4)
        np.testing.assert_array_equal(np.diag(full), np.zeros(4))
        back = strict_tri_to_tfp_vec(full, upper)
        np.testing.assert_array_equal(back, v.astype(np.float32))


def test_import_complete_and_param_count(wrapper):
    # trainable param count must equal the published 2433
    # (ref:models/NoiseFlow/hps.txt num_params)
    assert wrapper.flow.num_params(wrapper.params) == 2433
    # shared sdn_gain group carries the trained (non-init) values
    sg = wrapper.params["shared"]["sdn_gain"]
    assert sg["cam_params"].shape == (3, 5)
    # trained values must differ from the inits (-5.0 gain_params, 1.0 cam)
    assert not np.allclose(np.asarray(sg["gain_params"]), -5.0)
    assert not np.allclose(np.asarray(sg["cam_params"]), 1.0)


def test_lu_reconstruction_is_orthogonal_ish(wrapper):
    """Each imported 1x1 conv matrix must be well-conditioned and its
    A @ A_inv = I (LU solves are exact inverses by construction)."""
    from noise_flow_tpu.ops.conv1x1 import matrix_param_build
    for li, specs in enumerate(wrapper.flow.level_specs):
        for si, spec in enumerate(specs):
            if spec.kind != "conv1x1":
                continue
            p = wrapper.params["layers"][li][si]
            s = wrapper.state["layers"][li][si]
            m = matrix_param_build("LU", {"trainable": p["mat"],
                                          "frozen": s["frozen"]})
            ident = np.asarray(m["A"] @ m["A_inv"])
            np.testing.assert_allclose(ident, np.eye(4), atol=1e-4)
            # P must be a permutation matrix
            pm = np.asarray(s["frozen"]["p"])
            assert set(pm.flatten().tolist()) <= {0.0, 1.0}
            np.testing.assert_array_equal(pm.sum(0), np.ones(4))


def _nlf_batch(b=64, seed=0):
    """Deterministic S6/ISO-100-like batch: clean ramp + NLF noise
    (beta1, beta2 from ref:cam_iso_nlf.txt S6_00100)."""
    beta1, beta2 = 0.000479, 2e-6
    rng = np.random.default_rng(seed)
    clean = np.linspace(0.02, 0.6, b * 32 * 32 * 4, dtype=np.float32)
    clean = clean.reshape(b, 32, 32, 4)
    noise = rng.standard_normal((b, 32, 32, 4)).astype(np.float32)
    noise *= np.sqrt(beta1 * clean + beta2)
    cond = {"clean": jnp.asarray(clean),
            "nlf0": jnp.full((b,), beta1, jnp.float32),
            "nlf1": jnp.full((b,), beta2, jnp.float32),
            "iso": jnp.full((b,), 100.0, jnp.float32),
            "cam": jnp.full((b,), 2.0, jnp.float32)}
    return jnp.asarray(noise), cond, beta1, beta2


# Golden NLL of the deterministic batch above under the imported published
# weights (eval-mode BN), recorded from the first verified import. Guards
# against any silent regression in layers/import/conversion. Backend matmul
# modes differ (CPU f32: -12577.1; TPU default bf16 convs: -12585.8), hence
# the window — real import/layer regressions move this by hundreds of nats.
# No longer self-referential: the standalone numpy oracle
# (verification/oracle_nll.py, tests/test_oracle_nll.py) independently
# reproduces the CPU value to 9e-9 relative from the raw checkpoint.
GOLDEN_NLL = -12581.5
GOLDEN_TOL = 10.0


def test_golden_nll_imported_weights(wrapper):
    x, cond, _, _ = _nlf_batch()
    nll, sd_z, _ = wrapper.flow.loss(wrapper.params, wrapper.state, x, cond,
                                     train=False)
    nll = float(nll)
    # the published model must beat both shipped baselines on its own
    # training condition (hps.txt: nll_gauss=-11594.4, nll_sdn=-12718.8)
    assert nll < -12000.0, nll
    # whitening sanity: trained flow maps NLF noise near the base measure
    assert 0.5 < float(sd_z) < 1.5
    assert abs(nll - GOLDEN_NLL) < GOLDEN_TOL, f"golden NLL drifted: {nll}"


def test_sampling_matches_nlf_stats(wrapper):
    """Noise sampled from the published weights at (S6, ISO 100), temp 1.0
    must match the camera-NLF std within sampling error — the distributional
    claim of the paper on its training condition."""
    b = 256
    clean = np.full((b, 32, 32, 4), 0.10, np.float32)
    noise = wrapper.sample_noise_nf(clean, 0.0, 0.0, iso=100.0, cam=2.0,
                                    temp=1.0)
    pred = np.sqrt(0.000479 * 0.10 + 2e-6)
    got = float(np.std(noise))
    assert 0.6 * pred < got < 1.6 * pred, (got, pred)
    assert abs(float(np.mean(noise))) < 0.25 * pred


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NLF_TABLE = os.path.join(REPO, "cam_iso_nlf.txt")


def _nlf_rows():
    from noise_flow_tpu.data.sidd import load_cam_iso_nlf
    return sorted(load_cam_iso_nlf(_NLF_TABLE).items())


@pytest.fixture(scope="module")
def parity_grid(wrapper):
    """15-cell (cam, ISO) grid vs the published checkpoint — computed once
    (every row of ref:cam_iso_nlf.txt:1-16; VERDICT r3 item 2). The
    committed artifact twin (bigger batch, real chip) lives in
    experiments/ref_parity/."""
    from noise_flow_tpu.analysis.ref_parity import grid_cell
    rows = {}
    for i, (cam_iso, (b1, b2)) in enumerate(_nlf_rows()):
        rows[cam_iso] = grid_cell(wrapper, cam_iso, b1, b2, batch=64,
                                  temp=1.0, seed=1000 + i)
    return rows


@pytest.mark.parametrize("cam_iso", [r[0] for r in _nlf_rows()])
def test_parity_grid_cell(parity_grid, cam_iso):
    """Sampled noise std within 2x of the camera NLF prediction and the
    marginal KLD vs NLF noise small, for EVERY published (cam, ISO) cell —
    the full-table distributional claim, not just the S6/100 anchor."""
    row = parity_grid[cam_iso]
    assert 0.5 < row["std_ratio"] < 2.0, row
    assert abs(row["nf_mean"]) < 0.5 * row["pred_std"], row
    # histogram KLD vs NLF-generated noise: small in absolute terms. The
    # flow is NOT the NLF (it models real-noise departures from it), so the
    # bar is "same distribution family/scale", not the sampling floor.
    assert row["kld_nf_vs_nlf"] < 0.25, row


def test_parity_grid_mean_kld(parity_grid):
    """Across the 15 cells the mean KLD vs the NLF must be well under the
    'different model' scale (the reference's own paper-reported per-model
    KLD gaps are O(0.1); its NF-vs-real mean KLD is 0.0088)."""
    klds = np.asarray([r["kld_nf_vs_nlf"] for r in parity_grid.values()])
    ratios = np.asarray([r["std_ratio"] for r in parity_grid.values()])
    assert float(np.mean(klds)) < 0.1, klds
    assert 0.7 < float(np.mean(ratios)) < 1.4, ratios


def test_roundtrip_through_npz(tmp_path, wrapper):
    """convert_reference_model writes a TF-free npz that reloads bit-exact."""
    from noise_flow_tpu.utils.tf_import import convert_reference_model
    from noise_flow_tpu.wrapper import NoiseFlowWrapper

    out = tmp_path / "converted"
    convert_reference_model(REF_MODEL, str(out))
    nf2 = NoiseFlowWrapper(str(out))
    for a, b in zip(jax.tree_util.tree_leaves(wrapper.params),
                    jax.tree_util.tree_leaves(nf2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x, cond, _, _ = _nlf_batch()
    n1, _, _ = wrapper.flow.loss(wrapper.params, wrapper.state, x, cond, False)
    n2, _, _ = nf2.flow.loss(nf2.params, nf2.state, x, cond, False)
    assert float(n1) == pytest.approx(float(n2), abs=1e-3)
