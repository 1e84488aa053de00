"""Cross-validate the golden NLL with the standalone numpy oracle.

VERDICT r4 item 2: the golden constant in tests/test_tf_import.py was
recorded from the JAX implementation itself (the reference's TF-1.12 graph
cannot run under the installed TF 2.x), so a quirk error shifting both
identically would be invisible. noise_flow_tpu/verification/oracle_nll.py is
a second, independent numpy evaluation of the reference equations over the
RAW checkpoint variables; these tests pin the JAX NLL against it.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tests.test_tf_import import GOLDEN_NLL, GOLDEN_TOL, _nlf_batch  # noqa: E402

REF_MODEL = "/root/reference/models/NoiseFlow"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_MODEL, "ckpt",
                                    "model.ckpt.best.index")),
    reason="reference checkpoint not available")


@pytest.fixture(scope="module")
def raw_vars():
    pytest.importorskip("tensorflow")
    from noise_flow_tpu.utils.tf_import import read_tf_checkpoint
    return read_tf_checkpoint(os.path.join(REF_MODEL, "ckpt",
                                           "model.ckpt.best"))


@pytest.fixture(scope="module")
def wrapper():
    pytest.importorskip("tensorflow")
    from noise_flow_tpu.wrapper import NoiseFlowWrapper
    return NoiseFlowWrapper(REF_MODEL, sampling_temperature=0.6)


def test_oracle_matches_jax_nll(raw_vars, wrapper):
    """The independent numpy oracle and the JAX model must agree on the
    golden batch to <1e-3 relative — the golden constant is thereby
    cross-validated, not self-recorded."""
    from noise_flow_tpu.verification.oracle_nll import oracle_nll

    x, cond, _, _ = _nlf_batch()
    nll_jax, sdz_jax, _ = wrapper.flow.loss(
        wrapper.params, wrapper.state, x, cond, train=False)
    nll_jax, sdz_jax = float(nll_jax), float(sdz_jax)
    nll_np, sdz_np = oracle_nll(raw_vars, np.asarray(x),
                                np.asarray(cond["clean"]),
                                iso=100.0, cam=2.0)
    rel = abs(nll_np - nll_jax) / abs(nll_jax)
    assert rel < 1e-3, (nll_np, nll_jax, rel)
    assert abs(sdz_np - sdz_jax) < 1e-3, (sdz_np, sdz_jax)
    # and the oracle independently confirms the recorded golden constant
    assert abs(nll_np - GOLDEN_NLL) < GOLDEN_TOL, nll_np


@pytest.mark.parametrize("iso,cam", [(400.0, 0.0), (800.0, 2.0),
                                     (3200.0, 4.0)])
def test_oracle_matches_jax_other_conditions(raw_vars, wrapper, iso, cam):
    """Agreement must hold off the golden anchor too: other (cam, ISO)
    cells exercise the cam_params/gain_params gather paths."""
    from noise_flow_tpu.verification.oracle_nll import oracle_nll

    b = 32
    rng = np.random.default_rng(int(iso) + int(cam))
    clean = rng.uniform(0.02, 0.6, (b, 32, 32, 4)).astype(np.float32)
    noise = (rng.standard_normal((b, 32, 32, 4)) *
             np.sqrt(0.002 * clean + 1e-5)).astype(np.float32)
    cond = {"clean": clean,
            "nlf0": np.full((b,), 0.002, np.float32),
            "nlf1": np.full((b,), 1e-5, np.float32),
            "iso": np.full((b,), iso, np.float32),
            "cam": np.full((b,), cam, np.float32)}
    nll_jax, _, _ = wrapper.flow.loss(wrapper.params, wrapper.state,
                                      noise, cond, train=False)
    nll_np, _ = oracle_nll(raw_vars, noise, clean, iso=iso, cam=cam)
    rel = abs(nll_np - float(nll_jax)) / abs(float(nll_jax))
    assert rel < 1e-3, (nll_np, float(nll_jax), rel)


def test_oracle_rejects_unknown_arch(raw_vars):
    from noise_flow_tpu.verification.oracle_nll import oracle_nll

    with pytest.raises(ValueError, match="arch token"):
        oracle_nll(raw_vars, np.zeros((1, 32, 32, 4), np.float32),
                   np.zeros((1, 32, 32, 4), np.float32), 100.0, 2.0,
                   arch="sdn9")
