#!/usr/bin/env python
"""In-situ decomposition of the one-shot fused train step at batch 138.

VERDICT r4 item 1: `train_fused_b138` (85.5k patches/s) runs at ~1/4 of the
kernel's big-batch rate (346k at 8192). This script attributes a b138 step
the way experiments/structural_zeros.md attributed the sampler floor: every
variant runs INSIDE a jitted lax.scan over device-resident data (the
steady-state epoch-loop shape — no dispatch, no host link), and each ablation
removes ONE piece of the step:

    full          loss_and_grad + Adam update            (the real step)
    no_opt        loss_and_grad only                     (drop optimizer)
    no_fold_grad  prep + kernel + loss                   (drop fold-VJP)
    kernel_only   kernel + loss reductions, mats hoisted (drop fold fwd too)
    fold_only     prep + fold-VJP, no kernel             (the glue alone)
    opt_only      Adam update on fixed grads             (optimizer alone)

plus block-size variants of the kernel grid (bt in {46, 69}; 138 = 2*3*23,
one-shot VMEM cap ~64-70, so 46 = 3 blocks vs 69 = 2 blocks).

Isolated micro-kernels are NOT trustworthy on this stack (round-3 finding:
Mosaic optimizes patterns differently in isolation and rebuilding jit
closures measures retracing) — every number here comes from the same scan
context as the real step.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from noise_flow_tpu.config import default_config  # noqa: E402
from noise_flow_tpu.models.flow import NoiseFlow  # noqa: E402
from noise_flow_tpu.ops.pallas_train import FusedTrainStep, _jitted_step  # noqa: E402
from noise_flow_tpu.training.trainer import Trainer, make_optimizer  # noqa: E402
from noise_flow_tpu.parallel.mesh import make_mesh  # noqa: E402

B = 138
K = 64          # steps per scan dispatch
N = B * K


def staged_data(seed=0):
    rng = np.random.default_rng(seed)
    clean = rng.uniform(0.01, 0.9, (N, 32, 128)).astype(np.float32)
    x = (rng.standard_normal((N, 32, 128)) *
         np.sqrt(0.000479 * clean + 2e-6)).astype(np.float32)
    data = {
        "_x": jnp.asarray(x), "_y": jnp.asarray(clean),
        "nlf0": jnp.full((N,), 0.000479, jnp.float32),
        "nlf1": jnp.full((N,), 2e-6, jnp.float32),
        "iso": jnp.full((N,), 100.0, jnp.float32),
        "cam": jnp.full((N,), 2.0, jnp.float32),
    }
    idxs = jnp.asarray(
        np.arange(N, dtype=np.int32).reshape(K, B))
    return data, idxs


def batch_of(data, idx):
    mb = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
    cond = {"clean": mb["_y"], "nlf0": mb["nlf0"], "nlf1": mb["nlf1"],
            "iso": mb["iso"], "cam": mb["cam"]}
    return mb["_x"], cond


def time_scan(name, body, init_carry, data, idxs, windows=3):
    """jit(scan(body)) over K steps; best-of-windows us/step."""

    @jax.jit
    def run(carry, data, idxs):
        def f(c, idx):
            return body(c, data, idx)
        carry, outs = jax.lax.scan(f, carry, idxs)
        return carry, outs

    carry, outs = run(init_carry, data, idxs)   # compile
    jax.block_until_ready((carry, outs))
    best = np.inf
    for _ in range(windows):
        t0 = time.perf_counter()
        carry, outs = run(init_carry, data, idxs)
        jax.block_until_ready((carry, outs))
        best = min(best, (time.perf_counter() - t0) / K)
    us = best * 1e6
    print(f"{name:>16}: {us:8.1f} us/step  ({B / best / 1e3:7.1f}k patches/s)",
          flush=True)
    return us


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    cfg = default_config(patch_height=32, use_pallas=True)
    flow = NoiseFlow((32, 32, 4), cfg)
    trainer = Trainer(flow, cfg, mesh=make_mesh(1))
    params, state = trainer.params, trainer.state
    optimizer = make_optimizer(cfg)
    opt_state = trainer.opt_state
    data, idxs = staged_data()
    results = {}

    for bt in (46, 69):
        try:
            fs = FusedTrainStep(flow, bt=bt, mm_dtype=jnp.bfloat16)
        except ValueError as e:
            print(f"bt={bt}: envelope refused ({e})")
            continue

        def full(carry, data, idx, fs=fs):
            p, st, o = carry
            xp, cond = batch_of(data, idx)
            nll, sdz, new_st, grads = fs.loss_and_grad(p, st, xp, cond)
            updates, o = optimizer.update(grads, o, p)
            import optax
            p = optax.apply_updates(p, updates)
            return (p, new_st, o), nll

        def no_opt(carry, data, idx, fs=fs):
            p, st, o = carry
            xp, cond = batch_of(data, idx)
            nll, sdz, new_st, grads = fs.loss_and_grad(p, st, xp, cond)
            # consume grads so XLA cannot DCE the backward
            nll = nll + 0.0 * sum(jnp.sum(g) for g in
                                  jax.tree_util.tree_leaves(grads))
            return (p, new_st, o), nll

        def no_fold_grad(carry, data, idx, fs=fs):
            p, st, o = carry
            xp, cond = batch_of(data, idx)
            mats, sa, sb, ildj_scale, mix_logdet = fs._prep(
                p, st, cond, B)
            invb = jnp.full((1, 1), 1.0 / B, jnp.float32)
            outs = _jitted_step(
                fs.ops, fs.bt, "bfloat16", fs.ns_pad, fs.interpret, xp,
                cond["clean"], sa.reshape(B, 1, fs.ns_pad),
                sb.reshape(B, 1, fs.ns_pad), mats["rescales"], invb,
                mats["mixes"], mats["m1s"], mats["b1s"], mats["m2s"],
                mats["b2s"], mats["m3s"], mats["offs"])
            ldj = jnp.sum(outs[0][:, 0], axis=1)
            z2 = jnp.sum(outs[2][:, 0], axis=1)
            nll = jnp.mean(-(ldj + mix_logdet + ildj_scale - 0.5 * z2))
            # consume kernel grad outputs (keep them alive)
            nll = nll + 0.0 * sum(jnp.sum(o) for o in outs[3:5])
            return (p, st, o), nll

        # kernel_only: mats/sa/sb folded ONCE outside the scan
        mats0, sa0, sb0, ildj0, mld0 = jax.jit(
            lambda p, st: fs._prep(p, st, batch_of(data, idxs[0])[1], B)
        )(params, state)
        jax.block_until_ready(mats0)

        def kernel_only(carry, data, idx, fs=fs, mats=mats0, sa=sa0, sb=sb0):
            p, st, o = carry
            xp, cond = batch_of(data, idx)
            invb = jnp.full((1, 1), 1.0 / B, jnp.float32)
            outs = _jitted_step(
                fs.ops, fs.bt, "bfloat16", fs.ns_pad, fs.interpret, xp,
                cond["clean"], sa.reshape(B, 1, fs.ns_pad),
                sb.reshape(B, 1, fs.ns_pad), mats["rescales"], invb,
                mats["mixes"], mats["m1s"], mats["b1s"], mats["m2s"],
                mats["b2s"], mats["m3s"], mats["offs"])
            ldj = jnp.sum(outs[0][:, 0], axis=1)
            z2 = jnp.sum(outs[2][:, 0], axis=1)
            nll = jnp.mean(-(ldj - 0.5 * z2))
            nll = nll + 0.0 * sum(jnp.sum(o) for o in outs[3:5])
            return (p, st, o), nll

        def fold_only(carry, data, idx, fs=fs):
            p, st, o = carry
            xp, cond = batch_of(data, idx)
            prep = lambda pp: fs._prep(pp, st, cond, B)  # noqa: E731
            (mats, sa, sb, ildj_scale, mld), vjp_fn = jax.vjp(prep, p)
            cots = ({k: jnp.ones_like(v) for k, v in mats.items()},
                    jnp.ones_like(sa), jnp.ones_like(sb),
                    jnp.ones_like(ildj_scale), jnp.ones_like(mld))
            g = vjp_fn(cots)[0]
            s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
            return (p, st, o), s

        tag = f"bt{bt}"
        results[f"full_{tag}"] = time_scan(
            f"full {tag}", full, (params, state, opt_state), data, idxs)
        results[f"no_opt_{tag}"] = time_scan(
            f"no_opt {tag}", no_opt, (params, state, opt_state), data, idxs)
        results[f"no_fold_grad_{tag}"] = time_scan(
            f"no_fold_grad {tag}", no_fold_grad, (params, state, opt_state),
            data, idxs)
        results[f"kernel_only_{tag}"] = time_scan(
            f"kernel_only {tag}", kernel_only, (params, state, opt_state),
            data, idxs)
        if bt == 46:
            results["fold_only"] = time_scan(
                "fold_only", fold_only, (params, state, opt_state), data,
                idxs)

    # optimizer alone on fixed grads
    grads0 = jax.tree_util.tree_map(lambda a: jnp.ones_like(a) * 1e-6, params)

    def opt_only(carry, data, idx):
        p, o = carry
        import optax
        updates, o = optimizer.update(grads0, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), jnp.float32(0)

    results["opt_only"] = time_scan(
        "opt_only", opt_only, (params, opt_state), data, idxs)

    with open("/root/repo/experiments/b138_attrib.json", "w") as f:
        json.dump({k: round(v, 1) for k, v in results.items()}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
