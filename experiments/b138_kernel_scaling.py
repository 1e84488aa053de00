#!/usr/bin/env python
"""Kernel fixed-cost probe: one-shot kernel time vs block count at bt=46.

Follow-up to b138_attrib.py: kernel_only at b138 (3 blocks) costs 848 us vs
~390 us of block compute extrapolated from the big-batch rate — is the rest
per-CALL (launch/sync) or per-BLOCK? Times the same in-scan kernel_only
variant at b in {46, 138, 276, 552, 1104} (1..24 blocks) and fits
t = fixed + per_block * n.
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

BT = 46
K = 64


def main():
    assert jax.default_backend() == "tpu"
    cfg = default_config(patch_height=32, use_pallas=True)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    fs = FusedTrainStep(flow, bt=BT, mm_dtype=jnp.bfloat16)

    results = {}
    for nblocks in (1, 3, 6, 12, 24):
        b = BT * nblocks
        n = b * K
        rng = np.random.default_rng(0)
        clean = rng.uniform(0.01, 0.9, (n, 32, 128)).astype(np.float32)
        x = (rng.standard_normal((n, 32, 128)) *
             np.sqrt(0.000479 * clean + 2e-6)).astype(np.float32)
        data = {"_x": jnp.asarray(x), "_y": jnp.asarray(clean)}
        cond0 = {"clean": data["_y"][:b],
                 "nlf0": jnp.full((b,), 0.000479),
                 "nlf1": jnp.full((b,), 2e-6),
                 "iso": jnp.full((b,), 100.0),
                 "cam": jnp.full((b,), 2.0)}
        mats, sa, sb, _, _ = jax.jit(
            lambda p, st: fs._prep(p, st, cond0, b))(params, state)
        jax.block_until_ready(mats)
        idxs = jnp.asarray(np.arange(n, dtype=np.int32).reshape(K, b))
        invb = jnp.full((1, 1), 1.0 / b, jnp.float32)

        @jax.jit
        def run(data, idxs, mats, sa, sb):
            def body(c, idx):
                xp = jnp.take(data["_x"], idx, axis=0)
                clean = jnp.take(data["_y"], idx, axis=0)
                outs = _jitted_step(
                    fs.ops, fs.bt, "bfloat16", fs.ns_pad, fs.interpret, xp,
                    clean, sa.reshape(b, 1, fs.ns_pad),
                    sb.reshape(b, 1, fs.ns_pad), mats["rescales"], invb,
                    mats["mixes"], mats["m1s"], mats["b1s"], mats["m2s"],
                    mats["b2s"], mats["m3s"], mats["offs"])
                ldj = jnp.sum(outs[0][:, 0], axis=1)
                z2 = jnp.sum(outs[2][:, 0], axis=1)
                nll = jnp.mean(-(ldj - 0.5 * z2))
                nll = nll + 0.0 * sum(jnp.sum(o) for o in outs[3:5])
                return c, nll
            return jax.lax.scan(body, 0, idxs)

        out = run(data, idxs, mats, sa, sb)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(data, idxs, mats, sa, sb)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / K)
        us = best * 1e6
        results[nblocks] = us
        print(f"blocks={nblocks:2d} b={b:5d}: {us:8.1f} us/call "
              f"({b / best / 1e3:8.1f}k patches/s)", flush=True)

    ns = sorted(results)
    xs = np.asarray(ns, float)
    ys = np.asarray([results[n] for n in ns])
    slope, fixed = np.polyfit(xs, ys, 1)
    print(f"fit: fixed={fixed:.1f} us/call, per_block={slope:.1f} us")
    with open("/root/repo/experiments/b138_kernel_scaling.json", "w") as f:
        json.dump({"bt": BT, "us_per_call": {str(k): round(v, 1)
                                             for k, v in results.items()},
                   "fixed_us": round(float(fixed), 1),
                   "per_block_us": round(float(slope), 1)}, f, indent=1)


if __name__ == "__main__":
    main()
