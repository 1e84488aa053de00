"""Bisect the probe-vs-production sampler gap."""
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, WC = ps.H, ps.WC

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
sab = ps.precompute_scale_ab(program, cond)
sa, sb = sab
clean_t = clean.reshape(batch, H, WC)
bt = 64


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


# A: raw padded kernel call, direct (bypasses _sample_full)
def fA(i):
    seed = jnp.full((1, 1), i, jnp.int32)
    return ps._pallas_sample_padded(program, seed, clean_t, sa, sb, bt,
                                    False, jnp.bfloat16, temp=0.6,
                                    use_prng=True)
print(f"A raw padded kernel          : {timeit(fA)/1e6:7.3f} M/s")

# B: production _sample_full with precomputed sab
def fB(i):
    return ps.pallas_sample(program, i, cond, temp=0.6, bt=bt,
                            mm_dtype=jnp.bfloat16, in_kernel_rng=True,
                            scale_ab=sab)
print(f"B production + sab           : {timeit(fB)/1e6:7.3f} M/s")

# C: production without sab
def fC(i):
    return ps.pallas_sample(program, i, cond, temp=0.6, bt=bt,
                            mm_dtype=jnp.bfloat16, in_kernel_rng=True)
print(f"C production no sab          : {timeit(fC)/1e6:7.3f} M/s")

# D: raw kernel but seed built via jnp.full inside a wrapper jit + reshape out
@functools.partial(jax.jit, static_argnames=())
def _wrapD(seed, clean_t, sa, sb):
    out = ps._pallas_sample_padded(program, seed, clean_t, sa, sb, bt,
                                   False, jnp.bfloat16, temp=0.6,
                                   use_prng=True)
    return out[:batch].reshape(batch, H, 32, 4)
def fD(i):
    return _wrapD(jnp.full((1, 1), i, jnp.int32), clean_t, sa, sb)
print(f"D raw + outer jit + reshape  : {timeit(fD)/1e6:7.3f} M/s")
