"""Isolate production-path overhead vs the raw kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.config import default_config
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.ops import pallas_sample as ps
from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

cfg = default_config(patch_height=32)
flow = NoiseFlow((32, 32, 4), cfg)
params, state = flow.init(jax.random.PRNGKey(0))
program = ps.build_sample_program(flow, params, state)

batch = 8192
rng0 = np.random.default_rng(0)
clean = jnp.asarray(rng0.uniform(0.01, 0.9, (batch, 32, 32, 4)), jnp.float32)
cond = {"clean": clean, "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6), "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0)}
key = jax.random.PRNGKey(1)


def timeit(f, n=50):
    f(0).block_until_ready()
    for i in range(3):
        out = f(i)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n):
        out = f(100 + i)
    out.block_until_ready()
    return batch * n / (time.perf_counter() - t0)


# 1. full production path, fold_in per call
f1 = lambda i: ps.pallas_sample(program, jax.random.fold_in(key, i), cond,
                                temp=0.6, bt=64, mm_dtype=jnp.bfloat16,
                                in_kernel_rng=True)
print(f"prod+fold_in     : {timeit(f1)/1e6:7.3f} M/s")

# 2. production path, fixed key
f2 = lambda i: ps.pallas_sample(program, key, cond, temp=0.6, bt=64,
                                mm_dtype=jnp.bfloat16, in_kernel_rng=True)
print(f"prod fixed key   : {timeit(f2)/1e6:7.3f} M/s")

# 3. _sample_full components timed alone: scale_ab
sab = jax.jit(lambda c: program.scale_ab(c, batch))
g = lambda i: sab(cond)[0]
print(f"scale_ab alone   : {timeit(g)/1e6:7.3f} M-calls-equiv/s")
