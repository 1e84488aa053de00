"""Packed (lane-major) training path: parity of loss, gradients, and BN state
updates against the reference NHWC path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_flow_tpu.config import default_config
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.ops.packed_flow import PackedFlow, pack


def _flow(arch="sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc", **kw):
    cfg = default_config(arch=arch, patch_height=32, **kw)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x + 0.03 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
        params)
    state = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jnp.abs(
            jax.random.normal(jax.random.PRNGKey(2), x.shape)), state)
    return flow, params, state


def _batch(b, seed=0):
    rng = np.random.default_rng(seed)
    clean = rng.uniform(0.01, 0.9, (b, 32, 32, 4)).astype(np.float32)
    x = (rng.standard_normal((b, 32, 32, 4)) *
         np.sqrt(0.0005 * clean + 2e-6)).astype(np.float32)
    cond = {"clean": jnp.asarray(clean),
            "nlf0": jnp.full((b,), 0.0005), "nlf1": jnp.full((b,), 2e-6),
            "iso": jnp.asarray(rng.choice([100, 400, 800, 1600, 3200], b),
                               jnp.float32),
            "cam": jnp.full((b,), 2.0)}
    return jnp.asarray(x), cond


def _pack_cond(cond):
    out = dict(cond)
    out["clean"] = pack(np.asarray(cond["clean"]))
    return out


ARCHS = [
    "sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc",  # published model
    "unc|unc",                                     # unconditional
    "sdn|unc|gain|unc",                            # quirky gain ldj (scalar)
]


@pytest.mark.parametrize("arch", ARCHS)
@pytest.mark.parametrize("train", [True, False])
def test_packed_loss_matches_nhwc(arch, train):
    flow, params, state = _flow(arch)
    pf = PackedFlow(flow)
    x, cond = _batch(8)
    nll_ref, sdz_ref, st_ref = flow.loss(params, state, x, cond, train=train)
    nll_p, sdz_p, st_p = pf.loss(params, state, pack(np.asarray(x)),
                                 _pack_cond(cond), train=train)
    np.testing.assert_allclose(float(nll_p), float(nll_ref),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(sdz_p), float(sdz_ref),
                               rtol=1e-4, atol=1e-5)
    # BN running-state updates identical
    for a, b in zip(jax.tree_util.tree_leaves(st_ref),
                    jax.tree_util.tree_leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_packed_grads_match_nhwc():
    flow, params, state = _flow(ARCHS[0])
    pf = PackedFlow(flow)
    x, cond = _batch(8)
    xp, condp = pack(np.asarray(x)), _pack_cond(cond)

    g_ref = jax.grad(lambda p: flow.loss(p, state, x, cond, True)[0])(params)
    g_p = jax.grad(lambda p: pf.loss(p, state, xp, condp, True)[0])(params)
    flat_ref, tree_ref = jax.tree_util.tree_flatten(g_ref)
    flat_p, tree_p = jax.tree_util.tree_flatten(g_p)
    assert tree_ref == tree_p
    for a, b in zip(flat_ref, flat_p):
        a, b = np.asarray(a), np.asarray(b)
        # conv-bias grads are mathematically 0 (bias feeds BN, which
        # subtracts the mean); both paths return O(1e-3) f32 reduction noise
        # there. Treat leaves that are sub-noise on BOTH sides as equal.
        if max(np.max(np.abs(a)), np.max(np.abs(b))) < 2e-3:
            continue
        tol = max(5e-3 * float(np.max(np.abs(a))), 5e-4)
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=tol)


def test_packed_perm_reverse_arch():
    flow, params, state = _flow(ARCHS[0], flow_permutation=0)
    pf = PackedFlow(flow)
    x, cond = _batch(4)
    nll_ref, _, _ = flow.loss(params, state, x, cond, train=False)
    nll_p, _, _ = pf.loss(params, state, pack(np.asarray(x)),
                          _pack_cond(cond), train=False)
    np.testing.assert_allclose(float(nll_p), float(nll_ref),
                               rtol=2e-5, atol=2e-3)


def test_packed_nll_per_sample():
    flow, params, state = _flow("sdn5|unc|gain4|unc")
    pf = PackedFlow(flow)
    x, cond = _batch(6)
    ref = np.asarray(flow.nll_per_sample(params, state, x, cond))
    got = np.asarray(pf.nll_per_sample(params, state, pack(np.asarray(x)),
                                       _pack_cond(cond)))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-3)


def test_packed_rejects_unsupported():
    cfg = default_config(arch="", sidd_cond="condY", depth=1, patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    with pytest.raises(ValueError, match="unsupported layer kinds"):
        PackedFlow(flow)
    cfg16 = default_config(arch="unc", patch_height=16)
    with pytest.raises(ValueError, match="x_shape"):
        PackedFlow(NoiseFlow((16, 16, 4), cfg16))
