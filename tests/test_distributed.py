"""Distributed correctness: N-device sharded training must match 1-device
training (the psum-grad equivalence test from SURVEY.md §4), plus sharded
sampling gather semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.config import default_config
from noise_flow_tpu.data.patches import PatchDataset
from noise_flow_tpu.data.synthetic import make_synthetic_samples
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.parallel.mesh import make_mesh
from noise_flow_tpu.training.trainer import Trainer


def _train(mesh_size, n_steps=6):
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=16, lr=1e-3,
                         n_batch_train=16)
    flow = NoiseFlow((16, 16, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(mesh_size))
    tr = PatchDataset(make_synthetic_samples(2, 64, 64, iso=800, seed=0),
                      16, 16)
    nlls = []
    for e in range(n_steps):
        nll, sdz = trainer.train_epoch(
            tr.batches(16, shuffle=True, seed=e, drop_remainder=True))
        nlls.append(nll)
    return np.asarray(nlls), trainer


def test_sharded_grads_match_single_device():
    """psum-grad equivalence: the gradient of the sharded batch (all-reduced
    by XLA from the sharding) equals the single-device gradient up to f32
    reduction-order noise."""
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=16,
                         n_batch_train=16)
    flow = NoiseFlow((16, 16, 4), cfg)
    t1 = Trainer(flow, cfg, make_mesh(1))
    t8 = Trainer(flow, cfg, make_mesh(8))
    tr = PatchDataset(make_synthetic_samples(2, 64, 64, iso=800, seed=0),
                      16, 16)
    mb = next(iter(tr.batches(16, drop_remainder=True)))

    def grads_of(trainer):
        b = trainer._put(mb)
        from noise_flow_tpu.training.trainer import batch_to_cond

        def loss_fn(p):
            nll, _, _ = flow.loss(p, trainer.state, b["_x"],
                                  batch_to_cond(b), train=True)
            return nll
        return jax.jit(jax.grad(loss_fn))(trainer.params)

    g1 = jax.tree_util.tree_leaves(grads_of(t1))
    g8 = jax.tree_util.tree_leaves(grads_of(t8))
    scale = max(float(np.abs(np.asarray(a)).max()) for a in g1)
    for a, b in zip(g1, g8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * scale, rtol=1e-4)


def test_sharded_nll_trajectory_matches_single_device():
    """Full training trajectories agree to f32 accumulation noise."""
    nll1, _ = _train(1)
    nll8, _ = _train(8)
    np.testing.assert_allclose(nll1, nll8, rtol=5e-3)


def test_eval_is_mesh_invariant():
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=16)
    flow = NoiseFlow((16, 16, 4), cfg)
    ts = PatchDataset(make_synthetic_samples(2, 64, 64, iso=800, seed=3),
                      16, 16)
    t1 = Trainer(flow, cfg, make_mesh(1))
    t8 = Trainer(flow, cfg, make_mesh(8))
    n1, s1 = t1.eval_epoch(ts.batches(16, drop_remainder=True))
    n8, s8 = t8.eval_epoch(ts.batches(16, drop_remainder=True))
    np.testing.assert_allclose(n1, n8, rtol=1e-5)
    np.testing.assert_allclose(s1, s8, rtol=1e-5)


def test_sharded_sampling_covers_batch():
    """Sampling a sharded batch returns one sample per input row, assembled
    across devices."""
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=16, temp=1.0)
    flow = NoiseFlow((16, 16, 4), cfg)
    trainer = Trainer(flow, cfg, make_mesh(8))
    ts = PatchDataset(make_synthetic_samples(2, 64, 64, iso=800, seed=5),
                      16, 16)
    mb = next(iter(ts.batches(16, drop_remainder=True)))
    db = trainer._put(mb)
    x = trainer._sample_step(trainer.params, trainer.state,
                             jax.random.PRNGKey(0), db, 1.0)
    assert x.shape == mb["_x"].shape
    x_np = np.asarray(x)
    # all shards populated (no device returned zeros)
    per_shard = x_np.reshape(8, -1)
    assert np.all(np.std(per_shard, axis=1) > 0)


def test_global_mean_psum():
    """global_mean inside shard_map equals the full-batch mean."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from noise_flow_tpu.parallel.distributed import global_mean

    mesh = make_mesh(8)
    x = jnp.arange(64, dtype=jnp.float32)

    f = shard_map(lambda v: global_mean(v, "data").reshape(1),
                  mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.full(8, x.mean()),
                               rtol=1e-6)


def test_all_gather_samples():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from noise_flow_tpu.parallel.distributed import all_gather_samples

    mesh = make_mesh(8)
    x = jnp.arange(32, dtype=jnp.float32).reshape(32, 1)
    f = shard_map(lambda v: all_gather_samples(v, "data"),
                  mesh=mesh, in_specs=P("data"), out_specs=P(None),
                  check_vma=False)
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_sample_epoch_kld_mesh_matches_single_device():
    """The on-device sampling-KLD step under jit auto-partitioning on an
    8-device mesh equals the single-device result exactly (same keys) —
    and the split key's device placement is mesh-consistent (round-5 fix:
    split() commits to device 0, which conflicted with replicated params)."""
    import jax

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    ph = 16
    cfg = default_config(arch="sdn5|unc|gain4|unc", patch_height=ph,
                         n_batch_test=16)
    flow = NoiseFlow((ph, ph, 4), cfg)
    t8 = Trainer(flow, cfg, make_mesh(8))
    t1 = Trainer(flow, cfg, make_mesh(1))

    def mb(b, s):
        r = np.random.default_rng(s)
        clean = r.uniform(0.01, 0.9, (b, ph, ph, 4)).astype(np.float32)
        x = (r.standard_normal(clean.shape) * 0.02).astype(np.float32)
        return {"_x": x, "_y": clean,
                "nlf0": np.full((b,), 5e-4, np.float32),
                "nlf1": np.full((b,), 2e-6, np.float32),
                "iso": np.full((b,), 100., np.float32),
                "cam": np.full((b,), 2., np.float32)}

    batches = [mb(16, s) for s in range(3)]
    k = jax.random.PRNGKey(3)
    n8 = t8.sample_epoch(iter(batches), 1.0, k, sc_sd=0.02,
                         on_device_kld=True)
    n1 = t1.sample_epoch(iter(batches), 1.0, k, sc_sd=0.02,
                         on_device_kld=True)
    np.testing.assert_allclose(n8[0], n1[0], rtol=1e-4)
    np.testing.assert_allclose(n8[1], n1[1], rtol=1e-4)
    np.testing.assert_allclose(n8[2], n1[2], rtol=1e-3, atol=1e-5)
