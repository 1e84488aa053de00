"""Perf sweep for the fused Pallas sampler: bt x rng-mode x dtype."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.config import default_config
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.ops.pallas_sample import build_sample_program, pallas_sample
from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

cfg = default_config(patch_height=32)
flow = NoiseFlow((32, 32, 4), cfg)
params, state = flow.init(jax.random.PRNGKey(0))
program = build_sample_program(flow, params, state)

batch = 8192
rng0 = np.random.default_rng(0)
clean = jnp.asarray(rng0.uniform(0.01, 0.9, (batch, 32, 32, 4)), jnp.float32)
cond = {"clean": clean,
        "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6),
        "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0)}

per_row = 8 * (4 * 128 * 128 + 3 * 128 * 256) * 2 + 8 * 128 * 128 * 2
flops_per_patch = per_row * 32
sol = 197e12 / flops_per_patch

key = jax.random.PRNGKey(1)
for bt in (64, 128, 256, 512):
    for use_prng in (False, True):
        try:
            kw = dict(temp=0.6, bt=bt, mm_dtype=jnp.bfloat16,
                      in_kernel_rng=use_prng)
            pallas_sample(program, key, cond, **kw).block_until_ready()
            for i in range(5):
                out = pallas_sample(program, jax.random.fold_in(key, i),
                                    cond, **kw)
            out.block_until_ready()
            n = 50
            t0 = time.perf_counter()
            for i in range(n):
                out = pallas_sample(program, jax.random.fold_in(key, 100 + i),
                                    cond, **kw)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            sps = batch * n / dt
            print(f"bt={bt:4d} prng={int(use_prng)} : {sps/1e6:8.3f} M/s "
                  f"  frac_sol={sps/sol:.3f}")
        except Exception as e:
            print(f"bt={bt:4d} prng={int(use_prng)} : FAIL {type(e).__name__}: {e}")
