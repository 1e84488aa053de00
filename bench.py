#!/usr/bin/env python
"""Benchmark: noise-sampling throughput of the flagship model on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
measured against the speed-of-light estimate for this model on the current
chip: the flow is tiny (2.4k params, width-4 convs) and therefore strictly
HBM-bandwidth-bound; SoL = HBM_BW / (bytes moved per sample through the fused
sampling graph). vs_baseline ~ 1.0 means the hot loop runs at roofline.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow

    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))

    batch = 8192
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0.01, 0.9, (batch, 32, 32, 4)), jnp.float32)
    cond = {
        "clean": clean,
        "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6),
        "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0),
    }

    @jax.jit
    def sample(params, state, key):
        return flow.sample(params, state, key, cond, temp=1.0, batch=batch)

    key = jax.random.PRNGKey(1)
    sample(params, state, key).block_until_ready()  # compile

    n_iter = 20
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = sample(params, state, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    samples_per_sec = batch * n_iter / dt

    # --- speed-of-light estimate ---------------------------------------
    # bytes per sample: activation traffic through the sampling graph.
    # 8 couplings: read x0 (half patch) + NN intermediates (3 convs at width 4
    # on half-res channels) + write; 8 conv1x1 (read+write full patch);
    # 2 scale layers; RNG + clean read. Count full-patch-equivalents (fpe):
    patch_bytes = 32 * 32 * 4 * 4
    fpe = 0.0
    fpe += 2.0          # eps generation + initial write
    fpe += 1.0          # clean image read (sdn conditioning)
    fpe += 8 * 2.0      # conv1x1: read + write
    fpe += 8 * (0.5 + 3 * 1.0 + 0.5 + 1.0)  # coupling: x0 read, NN convs(w=4), affine rw
    fpe += 2 * 2.5      # sdn5/gain4 scale apply + logdet reads
    bytes_per_sample = fpe * patch_bytes

    dev = jax.devices()[0]
    plat = getattr(dev, "device_kind", str(dev))
    hbm_bw = 819e9 if "v5 lite" in str(plat).lower() or "v5e" in str(plat).lower() else 819e9
    sol = hbm_bw / bytes_per_sample
    vs_baseline = samples_per_sec / sol

    print(json.dumps({
        "metric": "noiseflow_sample_throughput",
        "value": round(samples_per_sec, 1),
        "unit": "patches/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
