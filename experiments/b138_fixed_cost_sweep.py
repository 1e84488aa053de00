#!/usr/bin/env python
"""Is the one-shot kernel's ~390 us per-call fixed cost per-call or per-op?

Times the in-scan kernel_only variant at grid=1 (bt=46) for arches with
2/4/8 couplings. If call time ~ fixed + per_coupling * nc, the 'fixed' cost
of the published arch is really serial per-coupling work (prologue DMA,
VMEM layout, accumulator handling); a flat intercept is a per-call floor.
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

B = 46
K = 64

ARCHES = {
    2: "sdn5|unc|gain4|unc",
    4: "sdn5|unc|unc|gain4|unc|unc",
    8: "sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc",
}


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    n = B * K
    clean = rng.uniform(0.01, 0.9, (n, 32, 128)).astype(np.float32)
    x = (rng.standard_normal((n, 32, 128)) *
         np.sqrt(0.000479 * clean + 2e-6)).astype(np.float32)
    data = {"_x": jnp.asarray(x), "_y": jnp.asarray(clean)}
    idxs = jnp.asarray(np.arange(n, dtype=np.int32).reshape(K, B))
    results = {}
    for nc, arch in ARCHES.items():
        cfg = default_config(patch_height=32, use_pallas=True, arch=arch)
        flow = NoiseFlow((32, 32, 4), cfg)
        params, state = flow.init(jax.random.PRNGKey(0))
        fs = FusedTrainStep(flow, bt=B, mm_dtype=jnp.bfloat16)
        cond0 = {"clean": data["_y"][:B],
                 "nlf0": jnp.full((B,), 0.000479),
                 "nlf1": jnp.full((B,), 2e-6),
                 "iso": jnp.full((B,), 100.0),
                 "cam": jnp.full((B,), 2.0)}
        mats, sa, sb, _, _ = jax.jit(
            lambda p, st: fs._prep(p, st, cond0, B))(params, state)
        jax.block_until_ready(mats)
        invb = jnp.full((1, 1), 1.0 / B, jnp.float32)

        @jax.jit
        def run(data, idxs, mats, sa, sb):
            def body(c, idx):
                xp = jnp.take(data["_x"], idx, axis=0)
                cl = jnp.take(data["_y"], idx, axis=0)
                outs = _jitted_step(
                    fs.ops, fs.bt, "bfloat16", fs.ns_pad, fs.interpret, xp,
                    cl, sa.reshape(B, 1, fs.ns_pad),
                    sb.reshape(B, 1, fs.ns_pad), mats["rescales"], invb,
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
        results[nc] = us
        print(f"nc={nc}: {us:8.1f} us/call", flush=True)

    ks = sorted(results)
    xs = np.asarray(ks, float)
    ys = np.asarray([results[k] for k in ks])
    slope, intercept = np.polyfit(xs, ys, 1)
    print(f"fit: per_call={intercept:.1f} us, per_coupling={slope:.1f} us")
    with open("/root/repo/experiments/b138_fixed_cost_sweep.json", "w") as f:
        json.dump({"bt": B, "grid": 1,
                   "us_per_call": {str(k): round(v, 1)
                                   for k, v in results.items()},
                   "per_call_us": round(float(intercept), 1),
                   "per_coupling_us": round(float(slope), 1)}, f, indent=1)


if __name__ == "__main__":
    main()
