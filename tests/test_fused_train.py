"""Test ladder for the fused Pallas training path (ops/pallas_train.py).

Run in interpret mode on CPU. The ladder demanded before FusedFlow counts as
implemented:

1. eval-mode forward parity vs the NHWC path (running-stats BN),
2. train-mode parity at B == bt (ghost BN == exact batch BN) for loss, sd_z,
   and BN running-state updates,
3. custom-vjp gradients vs ``jax.grad`` of the NHWC path at B == bt,
   including the exact-zero claim for conv biases feeding BN,
4. multi-block (B > bt) loss/grad/state parity vs an XLA ghost-BN reference
   built by vmapping the packed path over blocks — this exercises the
   ``pl.when(first)`` cross-block weight-grad accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_flow_tpu.config import default_config
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.ops.gaussian import diag_gaussian_logp
from noise_flow_tpu.ops.packed_flow import PackedFlow, pack
from noise_flow_tpu.ops.pallas_train import FusedFlow

ARCH = "sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc"  # published model


def _flow(arch=ARCH, **kw):
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


@pytest.mark.parametrize("arch", [ARCH, "unc|unc", "sdn|unc|gain|unc"])
def test_fused_eval_matches_nhwc(arch):
    flow, params, state = _flow(arch)
    ff = FusedFlow(flow, bt=8)
    x, cond = _batch(8)
    nll_ref, sdz_ref, _ = flow.loss(params, state, x, cond, train=False)
    nll_f, sdz_f, _ = ff.loss(params, state, pack(np.asarray(x)),
                              _pack_cond(cond), train=False)
    np.testing.assert_allclose(float(nll_f), float(nll_ref),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(sdz_f), float(sdz_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_train_matches_nhwc_single_block():
    """B == bt: ghost BN reduces to exact batch BN — full reference parity."""
    flow, params, state = _flow()
    ff = FusedFlow(flow, bt=8)
    x, cond = _batch(8)
    nll_ref, sdz_ref, st_ref = flow.loss(params, state, x, cond, train=True)
    nll_f, sdz_f, st_f = ff.loss(params, state, pack(np.asarray(x)),
                                 _pack_cond(cond), train=True)
    np.testing.assert_allclose(float(nll_f), float(nll_ref),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(sdz_f), float(sdz_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_ref),
                    jax.tree_util.tree_leaves(st_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _grad_leaves(tree):
    return {"/".join(str(p) for p, _ in [(k, None)]): None}  # unused


def test_fused_grads_match_nhwc_single_block():
    flow, params, state = _flow()
    ff = FusedFlow(flow, bt=8)
    x, cond = _batch(8)
    xp, condp = pack(np.asarray(x)), _pack_cond(cond)

    g_ref = jax.grad(lambda p: flow.loss(p, state, x, cond, True)[0])(params)
    g_f = jax.grad(lambda p: ff.loss(p, state, xp, condp, True)[0])(params)

    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    assert len(flat_ref) == len(flat_f)
    for (path_r, a), (path_f, b) in zip(flat_ref, flat_f):
        key = "/".join(str(p) for p in path_r)
        a, b = np.asarray(a), np.asarray(b)
        if "l1_b" in key or "l2_b" in key:
            # BN subtracts the mean: conv biases have zero gradient; the
            # kernel returns exact zeros, autodiff returns f32 noise
            assert np.max(np.abs(b)) == 0.0, key
            np.testing.assert_allclose(a, 0.0, atol=5e-3, err_msg=key)
            continue
        scale = max(np.max(np.abs(a)), 1e-8)
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=key)


def _ghost_bn_reference(pf, params, state, xp, condp, bt):
    """XLA ghost-BN twin of the fused kernel: per-block batch moments via
    vmap over block-reshaped input; scale layers are per-example so blocking
    is exact for them; prior is per-sample."""
    b = xp.shape[0]
    nb = b // bt
    xb = xp.reshape(nb, bt, *xp.shape[1:])
    cb = {}
    for k, v in condp.items():
        v = jnp.asarray(v)
        cb[k] = v.reshape(nb, bt, *v.shape[1:])

    def block(xblk, cblk):
        z, obj, new_state = pf.inverse(params, state, xblk, cblk, train=True)
        return z, obj, new_state

    z, obj, states = jax.vmap(block)(xb, cb)
    z = z.reshape(b, *z.shape[2:])
    obj = obj.reshape(b) + diag_gaussian_logp(z)
    nll = jnp.mean(-obj)
    sd_z = jnp.mean(jnp.sqrt(jnp.var(z.reshape(b, -1), axis=1)))
    # fused path averages block moments into the running-stat update
    avg_state = jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), states)
    return nll, sd_z, avg_state


def test_fused_multiblock_matches_ghost_bn_reference():
    flow, params, state = _flow()
    pf = PackedFlow(flow)
    bt = 8
    ff = FusedFlow(flow, bt=bt)
    x, cond = _batch(16)
    xp, condp = pack(np.asarray(x)), _pack_cond(cond)

    nll_g, sdz_g, st_g = _ghost_bn_reference(pf, params, state, xp, condp, bt)
    nll_f, sdz_f, st_f = ff.loss(params, state, xp, condp, train=True)
    np.testing.assert_allclose(float(nll_f), float(nll_g),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(sdz_f), float(sdz_g),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_g),
                    jax.tree_util.tree_leaves(st_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # gradient parity across blocks exercises the pl.when(first) accumulation
    g_g = jax.grad(lambda p: _ghost_bn_reference(
        pf, p, state, xp, condp, bt)[0])(params)
    g_f = jax.grad(lambda p: ff.loss(p, state, xp, condp, True)[0])(params)
    flat_g = jax.tree_util.tree_flatten_with_path(g_g)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    for (path_r, a), (_, b) in zip(flat_g, flat_f):
        key = "/".join(str(p) for p in path_r)
        a, b = np.asarray(a), np.asarray(b)
        if "l1_b" in key or "l2_b" in key:
            assert np.max(np.abs(b)) == 0.0, key
            continue
        scale = max(np.max(np.abs(a)), 1e-8)
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=key)


def test_fused_nll_finite_after_sgd_steps():
    """Three hand-rolled SGD steps through the fused loss stay finite and
    decrease NLL (smoke for the full custom-vjp in an optimization loop)."""
    flow, params, state = _flow()
    ff = FusedFlow(flow, bt=8)
    x, cond = _batch(8, seed=3)
    xp, condp = pack(np.asarray(x)), _pack_cond(cond)

    def loss_fn(p, st):
        nll, _, new_st = ff.loss(p, st, xp, condp, train=True)
        return nll, new_st

    nlls = []
    for _ in range(3):
        (nll, new_st), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state)
        # normalized step: NLL is O(1e4) nats so raw grads overshoot badly
        gmax = max(float(jnp.max(jnp.abs(x)))
                   for x in jax.tree_util.tree_leaves(g))
        params = jax.tree_util.tree_map(
            lambda p, gg: p - (1e-3 / gmax) * gg, params, g)
        state = new_st
        nlls.append(float(nll))
    assert all(np.isfinite(v) for v in nlls), nlls
    assert nlls[1] < nlls[0], nlls


# ---------------------------------------------------------------------------
# Trainer integration (cfg.use_pallas)
# ---------------------------------------------------------------------------

def _mb(b, seed):
    rng = np.random.default_rng(seed)
    clean = rng.uniform(0.01, 0.9, (b, 32, 32, 4)).astype(np.float32)
    x = (rng.standard_normal((b, 32, 32, 4)) *
         np.sqrt(0.0005 * clean + 2e-6)).astype(np.float32)
    return {"_x": x, "_y": clean,
            "nlf0": np.full((b,), 0.0005, np.float32),
            "nlf1": np.full((b,), 2e-6, np.float32),
            "iso": np.full((b,), 100.0, np.float32),
            "cam": np.full((b,), 2.0, np.float32)}


def test_trainer_fused_matches_xla_single_device():
    """Done-criterion from the round-1 review: the Trainer trains the
    published arch through the fused kernel with an NLL trajectory matching
    the XLA path to f32 noise (1-device mesh, batch <= 256 => exact BN)."""
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    mesh1 = make_mesh(1)
    cfg_x = default_config(arch=ARCH, patch_height=32, lr=1e-4)
    # float32 kernel matmuls for tight XLA parity (prod default is bf16)
    cfg_f = default_config(arch=ARCH, patch_height=32, lr=1e-4,
                           use_pallas=True, pallas_train_dtype="float32")
    tx = Trainer(NoiseFlow((32, 32, 4), cfg_x), cfg_x, mesh=mesh1)
    tf_ = Trainer(NoiseFlow((32, 32, 4), cfg_f), cfg_f, mesh=mesh1)
    assert tf_.use_fused

    batches = [_mb(16, s) for s in range(3)]
    for _ in range(2):
        nll_x, sdz_x = tx.train_epoch(iter(batches))
        nll_f, sdz_f = tf_.train_epoch(iter(batches))
        np.testing.assert_allclose(nll_f, nll_x, rtol=5e-4, atol=0.5)
        np.testing.assert_allclose(sdz_f, sdz_x, rtol=5e-3, atol=1e-3)
    # params after 6 steps stay numerically aligned. BN-fed conv biases are
    # excluded: their true gradient is zero, but Adam turns the XLA path's
    # f32 autodiff noise into lr-sized steps while the kernel keeps them
    # exactly at their init — the fused path is the more correct one.
    fx = jax.tree_util.tree_flatten_with_path(tx.params)[0]
    ff = jax.tree_util.tree_flatten_with_path(tf_.params)[0]
    for (path, a), (_, b) in zip(fx, ff):
        key = "/".join(str(p) for p in path)
        if "l1_b" in key or "l2_b" in key:
            continue
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4, err_msg=key)
    ev_x = tx.eval_epoch(iter(batches[:1]))
    ev_f = tf_.eval_epoch(iter(batches[:1]))
    np.testing.assert_allclose(ev_f[0], ev_x[0], rtol=5e-4, atol=0.5)


def test_trainer_fused_multidevice_shardmap():
    """Fused path under the 8-device mesh: per-device Pallas kernels via
    shard_map, grad psum by XLA. Ghost BN is per-device here, so we assert
    finite, decreasing NLL rather than exact XLA parity."""
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    mesh = make_mesh()
    assert mesh.size == 8
    cfg = default_config(arch=ARCH, patch_height=32, lr=1e-3,
                         use_pallas=True)
    tr = Trainer(NoiseFlow((32, 32, 4), cfg), cfg, mesh=mesh)
    assert tr.use_fused
    batches = [_mb(16, s) for s in range(2)]
    nll0, _ = tr.train_epoch(iter(batches))
    nll1, _ = tr.train_epoch(iter(batches))
    assert np.isfinite(nll0) and np.isfinite(nll1)
    assert nll1 < nll0


# ---------------------------------------------------------------------------
# one-shot loss+grad kernel (FusedTrainStep)
# ---------------------------------------------------------------------------

def _oneshot_and_segment(arch, b, bt, seed=0):
    from noise_flow_tpu.ops.pallas_train import FusedTrainStep

    flow, params, state = _flow(arch)
    x, cond = _batch(b, seed)
    xp, condp = pack(np.asarray(x)), _pack_cond(cond)
    ff = FusedFlow(flow, bt=bt)
    fs = FusedTrainStep(flow, bt=bt)

    def loss_fn(p):
        nll, sd_z, new_state = ff.loss(p, state, xp, condp, True)
        return nll, (sd_z, new_state)

    (nll0, (sd0, st0)), g0 = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    nll1, sd1, st1, g1 = fs.loss_and_grad(params, state, xp, condp)
    return (nll0, sd0, st0, g0), (nll1, sd1, st1, g1)


@pytest.mark.parametrize("arch,b,bt", [
    (ARCH, 8, 8),                      # published arch, single block
    (ARCH, 16, 8),                     # multi-block accumulation
    ("unc|unc", 8, 8),                 # no scale layers
    ("sdn|unc|gain2|unc", 8, 8),       # other scale kinds (scalar-ldj gain)
    # batch > 64 at the default-path block (_pick_block target=64): pins the
    # ghost-BN semantics the Trainer's one-shot default actually runs there
    # — two 64-blocks, NOT exact batch BN (see trainer.py block-size note)
    ("sdn5|unc|gain4|unc", 128, 64),
])
def test_oneshot_matches_segment_path(arch, b, bt):
    """FusedTrainStep == jax.value_and_grad of the custom_vjp segment path:
    loss, sd_z, BN state update, and every parameter gradient."""
    (nll0, sd0, st0, g0), (nll1, sd1, st1, g1) = _oneshot_and_segment(
        arch, b, bt)
    np.testing.assert_allclose(float(nll1), float(nll0), rtol=2e-6, atol=1e-3)
    np.testing.assert_allclose(float(sd1), float(sd0), rtol=1e-5, atol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    for (path, a), (_, c) in zip(flat0, flat1):
        key = "/".join(str(p) for p in path)
        a, c = np.asarray(a), np.asarray(c)
        scale = max(np.max(np.abs(a)), 1e-8)
        np.testing.assert_allclose(c, a, rtol=5e-5, atol=5e-5 * scale,
                                   err_msg=key)


def test_oneshot_grads_match_nhwc_single_block():
    """B == bt: one-shot grads vs jax.grad of the NHWC XLA path (exact batch
    BN), the same reference-parity bar as the segment path."""
    from noise_flow_tpu.ops.pallas_train import FusedTrainStep

    flow, params, state = _flow()
    x, cond = _batch(8)
    xp, condp = pack(np.asarray(x)), _pack_cond(cond)
    fs = FusedTrainStep(flow, bt=8)

    g_ref = jax.grad(lambda p: flow.loss(p, state, x, cond, True)[0])(params)
    nll_ref = flow.loss(params, state, x, cond, True)[0]
    nll1, _, _, g1 = fs.loss_and_grad(params, state, xp, condp)
    np.testing.assert_allclose(float(nll1), float(nll_ref),
                               rtol=2e-5, atol=2e-3)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    for (path, a), (_, c) in zip(flat_ref, flat_1):
        key = "/".join(str(p) for p in path)
        a, c = np.asarray(a), np.asarray(c)
        if "l1_b" in key or "l2_b" in key:
            assert np.max(np.abs(c)) == 0.0, key
            continue
        scale = max(np.max(np.abs(a)), 1e-8)
        np.testing.assert_allclose(c, a, rtol=2e-4, atol=2e-4 * scale,
                                   err_msg=key)


def test_trainer_oneshot_toggle_equivalence():
    """Trainer(pallas_oneshot=True) and =False produce the same parameter
    trajectory (the one-shot kernel is a drop-in for value_and_grad)."""
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    outs = {}
    for oneshot in (True, False):
        cfg = default_config(arch=ARCH, patch_height=32, lr=1e-3,
                             use_pallas=True)
        cfg.pallas_oneshot = oneshot
        tr = Trainer(NoiseFlow((32, 32, 4), cfg), cfg, mesh=make_mesh(1))
        assert tr.use_oneshot == oneshot
        batches = [_mb(8, s) for s in range(2)]
        tr.train_epoch(iter(batches))
        outs[oneshot] = tr.params
    fa = jax.tree_util.tree_flatten_with_path(outs[True])[0]
    fb = jax.tree_util.tree_flatten_with_path(outs[False])[0]
    for (path, a), (_, b) in zip(fa, fb):
        key = "/".join(str(p) for p in path)
        if "l1_b" in key or "l2_b" in key:
            continue  # zero-grad biases: f32 noise vs exact zeros
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=key)


def test_trainer_oneshot_scan_dispatch():
    """One-shot kernel inside the lax.scan multi-step dispatch
    (Trainer.train_epoch(steps_per_call=K)) matches the step-per-call loop."""
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    batches = [_mb(8, s) for s in range(4)]
    outs = {}
    for k in (1, 2):
        cfg = default_config(arch=ARCH, patch_height=32, lr=1e-3,
                             use_pallas=True)
        tr = Trainer(NoiseFlow((32, 32, 4), cfg), cfg, mesh=make_mesh(1))
        assert tr.use_oneshot
        nll, _ = tr.train_epoch(iter(batches), steps_per_call=k)
        outs[k] = (nll, tr.params)
    np.testing.assert_allclose(outs[2][0], outs[1][0], rtol=1e-5, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(outs[1][1]),
                    jax.tree_util.tree_leaves(outs[2][1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fold_batched_matches_loop():
    """The vectorized fold (one stacked einsum per matrix type) must equal
    the loop fold bit-for-bit in values AND parameter gradients — it is the
    hot glue of every b138 train step (experiments/b138_attrib.py)."""
    import noise_flow_tpu.ops.pallas_train as pt

    cfg = default_config(arch=ARCH, patch_height=32, use_pallas=True)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(3))
    fs = pt.FusedTrainStep(flow, bt=8)
    specs = flow.level_specs[0]
    sl = [specs[i] for i in fs.nonscale_idx]
    st_ = [state["layers"][0][i] for i in fs.nonscale_idx]
    assert pt._can_batch_fold(sl, cfg)

    def fold(p, batched: bool):
        orig = pt._can_batch_fold
        if not batched:
            pt._can_batch_fold = lambda *a: False
        try:
            pl_ = [p["layers"][0][i] for i in fs.nonscale_idx]
            return pt._fold_segment(fs.seg, sl, pl_, st_, cfg, fs.width)
        finally:
            pt._can_batch_fold = orig

    mats_b, mld_b = fold(params, True)
    mats_l, mld_l = fold(params, False)
    for k in mats_l:
        np.testing.assert_allclose(np.asarray(mats_b[k]),
                                   np.asarray(mats_l[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(float(mld_b), float(mld_l), rtol=1e-6)

    def lossy(p, batched):
        m, mld = fold(p, batched)
        return (sum(jnp.sum(v * (1.3 + i))
                    for i, v in enumerate(m.values())) + 2.0 * mld)

    g_b = jax.grad(lambda p: lossy(p, True))(params)
    g_l = jax.grad(lambda p: lossy(p, False))(params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_b)[0],
            jax.tree_util.tree_flatten_with_path(g_l)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pa))


def test_pick_block_stretch():
    """b138 runs as 2 blocks of 69 (fewer per-call-floor paying blocks),
    while block-aligned batches keep their exact divisors."""
    from noise_flow_tpu.training.trainer import _pick_block

    assert _pick_block(138, target=64, stretch=8) == 69
    assert _pick_block(128, target=64, stretch=8) == 64
    assert _pick_block(64, target=64, stretch=8) == 64
    assert _pick_block(2048, target=64, stretch=8) == 64
    assert _pick_block(138, target=64) == 46      # no stretch: old choice
    assert _pick_block(138, target=128) == 69     # segment path
