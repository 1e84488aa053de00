"""Fused Pallas sampling kernel: parity vs the XLA path (interpret mode on
CPU), dtype behavior, and unsupported-arch gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_flow_tpu.config import default_config
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.ops.pallas_sample import (
    build_sample_program,
    pallas_sample,
)


def _randomized_flow(arch="sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc"):
    cfg = default_config(arch=arch, patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    # perturb so zero-convs and BN stats are nontrivial
    params = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
        params)
    state = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jnp.abs(
            jax.random.normal(jax.random.PRNGKey(2), x.shape)), state)
    return flow, params, state


def _cond(b, iso=100.0, cam=2.0, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "clean": jnp.asarray(rng.uniform(0.01, 0.9, (b, 32, 32, 4)),
                             jnp.float32),
        "nlf0": jnp.full((b,), 0.0005), "nlf1": jnp.full((b,), 2e-6),
        "iso": jnp.full((b,), iso), "cam": jnp.full((b,), cam),
    }


def test_pallas_matches_xla_forward():
    flow, params, state = _randomized_flow()
    b = 8
    cond = _cond(b)
    eps = np.random.default_rng(0).standard_normal((b, 32, 32, 4)).astype(np.float32)
    x_ref = flow.forward(params, state, jnp.asarray(eps) * 0.6, cond,
                         train=False)
    prog = build_sample_program(flow, params, state)
    x_pal = pallas_sample(prog, None, cond, temp=0.6, eps=eps, bt=8)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_per_example_conditioning():
    """Different iso per example must change per-example scales."""
    flow, params, state = _randomized_flow()
    b = 8
    cond = _cond(b)
    cond["iso"] = jnp.asarray([100, 400, 800, 1600, 3200, 100, 800, 3200],
                              jnp.float32)
    eps = np.random.default_rng(1).standard_normal((b, 32, 32, 4)).astype(np.float32)
    x_ref = flow.forward(params, state, jnp.asarray(eps), cond, train=False)
    prog = build_sample_program(flow, params, state)
    x_pal = pallas_sample(prog, None, cond, temp=1.0, eps=eps, bt=8)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_padding_to_tile():
    """Batch not divisible by bt gets padded and sliced back."""
    flow, params, state = _randomized_flow(arch="sdn5|unc|gain4|unc")
    b = 5
    cond = _cond(b)
    eps = np.random.default_rng(2).standard_normal((b, 32, 32, 4)).astype(np.float32)
    x_ref = flow.forward(params, state, jnp.asarray(eps), cond, train=False)
    prog = build_sample_program(flow, params, state)
    x_pal = pallas_sample(prog, None, cond, temp=1.0, eps=eps, bt=8)
    assert x_pal.shape == (5, 32, 32, 4)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_bf16_close():
    flow, params, state = _randomized_flow(arch="sdn5|unc|gain4|unc")
    b = 8
    cond = _cond(b)
    eps = np.random.default_rng(3).standard_normal((b, 32, 32, 4)).astype(np.float32)
    prog = build_sample_program(flow, params, state)
    x32 = pallas_sample(prog, None, cond, temp=1.0, eps=eps, bt=8)
    x16 = pallas_sample(prog, None, cond, temp=1.0, eps=eps, bt=8,
                        mm_dtype=jnp.bfloat16)
    # bf16 matmuls: ~0.5% relative tolerance on the noise scale
    scale = float(np.std(np.asarray(x32)))
    assert np.max(np.abs(np.asarray(x16) - np.asarray(x32))) < 0.05 * scale


def test_pallas_rng_path_statistics():
    """Without pre-drawn eps, samples have ~N(0, temp^2) latent statistics
    through an identity-ish flow."""
    cfg = default_config(arch="unc", patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))  # zero-init couplings
    prog = build_sample_program(flow, params, state)
    cond = _cond(64)
    x = pallas_sample(prog, jax.random.PRNGKey(7), cond, temp=0.5, bt=32)
    # couplings are zero-init => x ~ N(0, 0.5^2) modulo the 1x1 conv rotation
    assert abs(float(jnp.std(x)) - 0.5) < 0.02


def test_pallas_unsupported_arch_raises():
    cfg = default_config(arch="", sidd_cond="condY", depth=1, patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="not supported"):
        build_sample_program(flow, params, state)


def test_pallas_wrong_shape_raises():
    cfg = default_config(arch="unc", patch_height=16)
    flow = NoiseFlow((16, 16, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="x_shape"):
        build_sample_program(flow, params, state)


def test_pallas_batch_bn_matches_xla_train_mode():
    """bn_mode='batch' with one block per batch reproduces the reference
    wrapper's is_training=True BN quirk exactly (ref:NoiseFlowWrapper.py:86):
    parity vs flow.forward(train=True) on shared eps."""
    flow, params, state = _randomized_flow()
    b = 8
    cond = _cond(b, seed=5)
    eps = np.random.default_rng(7).standard_normal((b, 32, 32, 4)).astype(np.float32)
    x_ref = flow.forward(params, state, jnp.asarray(eps), cond, train=True)
    prog = build_sample_program(flow, params, state, bn_mode="batch")
    x_pal = pallas_sample(prog, None, cond, temp=1.0, eps=eps, bt=b)
    # tolerance: in-kernel moments use a channel-select matmul; f32
    # reduction order differs from jnp.mean
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=2e-3, atol=2e-4)
    # and it must DIFFER from the running-stats mode (the quirk is real)
    prog_run = build_sample_program(flow, params, state, bn_mode="running")
    x_run = pallas_sample(prog_run, None, cond, temp=1.0, eps=eps, bt=b)
    assert np.max(np.abs(np.asarray(x_run) - np.asarray(x_pal))) > 1e-6


def test_pallas_batch_bn_v1_fold():
    flow, params, state = _randomized_flow()
    b = 8
    cond = _cond(b, seed=6)
    eps = np.random.default_rng(8).standard_normal((b, 32, 32, 4)).astype(np.float32)
    x_ref = flow.forward(params, state, jnp.asarray(eps), cond, train=True)
    prog = build_sample_program(flow, params, state, version=1,
                                bn_mode="batch")
    x_pal = pallas_sample(prog, None, cond, temp=1.0, eps=eps, bt=b)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=2e-3, atol=2e-4)


def test_wrapper_pallas_bn_quirk_parity(tmp_path):
    """NoiseFlowWrapper(use_pallas=True) with the default bn_batch_stats=True
    now matches the XLA quirk path distributionally (same trained-state drift
    bound the round-1 review asked for)."""
    import os

    from noise_flow_tpu.config import default_config, save_hps
    from noise_flow_tpu.utils.checkpoint import save_checkpoint
    from noise_flow_tpu.wrapper import NoiseFlowWrapper

    flow, params, state = _randomized_flow()
    d = tmp_path / "model"
    os.makedirs(d / "ckpt", exist_ok=True)
    save_hps(str(d / "hps.txt"), flow.cfg, flow.get_layer_names(),
             flow.num_params(params))
    save_checkpoint(str(d / "ckpt"), "best", params, state, None, 0)

    nf_x = NoiseFlowWrapper(str(d), bn_batch_stats=True, use_pallas=False,
                            seed=3)
    nf_p = NoiseFlowWrapper(str(d), bn_batch_stats=True, use_pallas=True,
                            seed=3)
    clean = np.full((64, 32, 32, 4), 0.2, np.float32)
    a = nf_x.sample_noise_nf(clean, 0.0, 0.0, 100.0, 2.0, temp=1.0)
    p = nf_p.sample_noise_nf(clean, 0.0, 0.0, 100.0, 2.0, temp=1.0)
    # different rng streams -> compare moments, tight because both use
    # batch-stats BN now
    assert abs(a.std() - p.std()) < 0.15 * max(a.std(), 1e-6)
    assert abs(a.mean() - p.mean()) < 0.2 * a.std()
