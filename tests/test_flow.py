"""End-to-end flow model tests: published arch parity, inverse/forward
round-trip, sampling shapes, loss math."""

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.config import default_config
from noise_flow_tpu.models.flow import NoiseFlow

H = W = 8
C = 4
B = 6


def make_cond(b=B, h=H, w=W):
    k = jax.random.PRNGKey(7)
    return {
        "clean": jax.random.uniform(k, (b, h, w, C), minval=0.01, maxval=0.9),
        "nlf0": jnp.full((b,), 0.01), "nlf1": jnp.full((b,), 0.002),
        "iso": jnp.full((b,), 100.0), "cam": jnp.full((b,), 2.0),
    }


def test_published_arch_param_count():
    """S-Ax4-G-Ax4 with width 4 must have exactly 2433 trainable params
    (ref:models/NoiseFlow/hps.txt num_params)."""
    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    assert flow.num_params(params) == 2433
    # and the non-trainable side: 8x(P 16 + sign_s 4) + 8x2 BN (mean+var 4+4)
    n_state = int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(state)))
    assert n_state == 288


def test_layer_names_match_reference():
    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    names = flow.get_layer_names()
    assert names == [
        "sdn_0", "Conv2d_1x1_1", "unc_1", "Conv2d_1x1_2", "unc_2",
        "Conv2d_1x1_3", "unc_3", "Conv2d_1x1_4", "unc_4", "gain_5",
        "Conv2d_1x1_6", "unc_6", "Conv2d_1x1_7", "unc_7", "Conv2d_1x1_8",
        "unc_8", "Conv2d_1x1_9", "unc_9",
    ]


def test_flow_roundtrip():
    cfg = default_config(patch_height=H)
    flow = NoiseFlow((H, W, C), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    cond = make_cond()
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C)) * 0.01
    z, obj, _ = flow.inverse(params, state, x, cond, train=False)
    x2 = flow.forward(params, state, z, cond, train=False)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-6)


def test_loss_matches_manual():
    """NLL == -(sum ildj + logp(z)) averaged over batch; sd_z sane."""
    cfg = default_config(patch_height=H)
    flow = NoiseFlow((H, W, C), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    cond = make_cond()
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C)) * 0.01
    nll, sd_z, _ = flow.loss(params, state, x, cond, train=False)
    z, obj, _ = flow.inverse(params, state, x, cond, train=False)
    logp = -0.5 * (np.log(2 * np.pi) + np.asarray(z) ** 2)
    logp = logp.reshape(B, -1).sum(1)
    want = float(np.mean(-(np.asarray(obj) + logp)))
    np.testing.assert_allclose(float(nll), want, rtol=1e-5)
    assert 0.0 < float(sd_z) < 100.0


def test_sampling_shape_and_temp():
    cfg = default_config(patch_height=H)
    flow = NoiseFlow((H, W, C), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    cond = make_cond()
    x1 = flow.sample(params, state, jax.random.PRNGKey(3), cond, temp=1.0)
    x0 = flow.sample(params, state, jax.random.PRNGKey(3), cond, temp=0.01)
    assert x1.shape == (B, H, W, C)
    # lower temperature -> smaller samples (same eps draw, scaled)
    assert float(jnp.std(x0)) < float(jnp.std(x1))


def test_sample_nll_roundtrip():
    """Samples pushed back through the inverse must have finite, plausible NLL
    (the reference's implicit forward∘inverse check, ref:train_noise_flow.py:174-175)."""
    cfg = default_config(patch_height=H)
    flow = NoiseFlow((H, W, C), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    cond = make_cond()
    xs = flow.sample(params, state, jax.random.PRNGKey(3), cond, temp=1.0)
    nll, sd_z, _ = flow.loss(params, state, xs, cond, train=False)
    assert np.isfinite(float(nll))
    # at temp 1 and eval-mode the latent of samples should have sd ~ 1
    assert 0.5 < float(sd_z) < 2.0


def test_uncond_arch():
    cfg = default_config(arch="unc", patch_height=H)
    flow = NoiseFlow((H, W, C), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C)) * 0.1
    nll, sd_z, _ = flow.loss(params, state, x, {"clean": None}, train=False)
    assert np.isfinite(float(nll))


def test_multiscale_arch():
    """2-level flow with squeeze factor 2 + split prior round-trips its NLL
    path and samples the right shape."""
    cfg = default_config(arch="unc|unc", patch_height=16, n_levels=2,
                         squeeze_factor=2)
    flow = NoiseFlow((16, 16, C), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    b = 3
    cond = {"clean": jax.random.uniform(jax.random.PRNGKey(5), (b, 16, 16, C))}
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 16, 16, C)) * 0.1
    z, obj, _ = flow.inverse(params, state, x, {"clean": None}, train=False)
    assert z.shape[1:] == tuple(flow.level_shapes[-1])
    xs = flow.sample(params, state, jax.random.PRNGKey(2), cond, temp=1.0, batch=b)
    assert xs.shape == (b, 16, 16, C)


def test_legacy_revnet_condY():
    cfg = default_config(arch="", sidd_cond="condY", depth=2, patch_height=H)
    flow = NoiseFlow((H, W, C), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    cond = make_cond()
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C)) * 0.1
    nll, _, _ = flow.loss(params, state, x, cond, train=True)
    assert np.isfinite(float(nll))
    z, obj, _ = flow.inverse(params, state, x, cond, train=False)
    x2 = flow.forward(params, state, z, cond, train=False)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4, atol=1e-6)
