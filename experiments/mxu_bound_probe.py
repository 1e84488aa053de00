"""Is the fused sampler MXU-bound or latency-bound? (VERDICT r3 item 5)

Decides whether any denser decomposition could move mfu_useful: run the
UNCHANGED sampler with f32 matmuls vs bf16, same shapes, interleaved A/B
windows on the same chip, and CALIBRATE against the dense-matmul f32/bf16
cost factor measured in the same process (on TPU an f32 matmul is several
bf16 MXU passes, not 2 — the dense ratio is the empirical constant).

- sampler ratio ~= dense ratio  => the chain runs at the MXU's matmul
  throughput: padded FLOPs ARE the cost, and the only lever is fewer
  128x128 tiles per coupling — experiments/structural_zeros.md shows the
  6-matmul fold is already at that floor.
- sampler ratio << dense ratio  => latency/overhead-bound; denser packings
  would not raise throughput either.

Also reports the chip contention probe so the A/B is tenancy-calibrated.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def rate(sampler, batch, n_iter=20, windows=3, seed0=0):
    best = 0.0
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = sampler(seed0 + 1000 * w + i)
        out.block_until_ready()
        best = max(best, batch * n_iter / (time.perf_counter() - t0))
    return best


def dense_rate(dtype, n=4096, n_iter=20, windows=3):
    """Dense nxn matmul TFLOP/s at the given input dtype (f32 accumulate)."""
    import jax
    import jax.numpy as jnp

    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    a = jax.random.normal(k0, (n, n), dtype)
    b = jax.random.normal(k1, (n, n), dtype)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    mm(a, b).block_until_ready()
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = mm(a, b)
        out.block_until_ready()
        best = max(best, 2.0 * n ** 3 * n_iter / (time.perf_counter() - t0))
    return best / 1e12


def pallas_mm_chain_rate(dtype_name: str, bt=64, batch=8192, n_mm=56,
                         n_iter=20, windows=3):
    """Pure dependent-matmul Pallas chain at the sampler's exact tile shapes
    ([bt*32, 128] x [128, 128], n_mm per block — the sampler runs 56). The
    bf16/f32 ratio of THIS kernel is the empirical Mosaic f32 multi-pass
    cost factor k at these shapes; measured in the same process as the
    sampler A/B so tenancy cancels."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:].reshape(bt * 32, 128)
        for i in range(n_mm):
            x = jax.lax.dot(x.astype(dt), w_ref[i].astype(dt),
                            preferred_element_type=jnp.float32)
        o_ref[:] = x.reshape(bt, 32, 128)

    x = jnp.ones((batch, 32, 128), jnp.float32) * 0.01
    w = jnp.full((n_mm, 128, 128), 0.008, jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid=(batch // bt,),
        in_specs=[pl.BlockSpec((bt, 32, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n_mm, 128, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, 32, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 32, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    jf = jax.jit(lambda x: f(x, w))
    jf(x).block_until_ready()
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = jf(x)
        out.block_until_ready()
        best = max(best, batch * n_iter / (time.perf_counter() - t0))
    return best  # patches/s through the pure chain


def main():
    import jax
    import jax.numpy as jnp

    from bench import bench_chip_probe
    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.ops.pallas_sample import (
        build_sample_program, make_sampler)

    assert jax.default_backend() == "tpu", "run on the real chip"
    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    program = build_sample_program(flow, params, state)
    batch = 8192
    rng = np.random.default_rng(0)
    cond = {
        "clean": jnp.asarray(rng.uniform(0.01, 0.9, (batch, 32, 32, 4)),
                             jnp.float32),
        "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6),
        "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0),
    }
    samplers = {}
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        s = make_sampler(program, cond, temp=0.6, bt=64, mm_dtype=dt)
        s(1).block_until_ready()
        for i in range(4):
            out = s(2 + i)
        out.block_until_ready()
        samplers[name] = s

    probe0 = bench_chip_probe()
    # interleaved A/B so chip-load drift cancels
    r = {"bf16": 0.0, "f32": 0.0}
    for rep in range(3):
        for name in ("bf16", "f32"):
            r[name] = max(r[name], rate(samplers[name], batch,
                                        seed0=100 + 10000 * rep))
    probe1 = bench_chip_probe()
    chain = {name: pallas_mm_chain_rate(name) for name in ("bf16", "f32")}
    ratio = r["bf16"] / r["f32"]
    k = chain["bf16"] / chain["f32"]  # Mosaic f32 multi-pass factor
    print(f"chip_probe_tflops: {probe0:.1f} / {probe1:.1f}")
    print(f"pure pallas mm-chain (56x [2048,128]x[128,128]): "
          f"bf16 {chain['bf16']:,.0f} p/s, f32 {chain['f32']:,.0f} p/s "
          f"=> f32 cost factor k = {k:.2f}")
    print(f"sampler bf16: {r['bf16']:,.0f} patches/s")
    print(f"sampler f32 : {r['f32']:,.0f} patches/s")
    print(f"sampler bf16/f32 ratio R = {ratio:.3f}")
    # T_bf16 = M + O, T_f32 = k*M + O  =>  matmul share M/(M+O) = (R-1)/(k-1)
    if k > 1:
        share = (ratio - 1) / (k - 1)
        print(f"matmul share of sampler time = (R-1)/(k-1) = {share:.2f} "
              f"(1.0 => fully MXU-throughput-bound)")
    print(f"sampler bf16 vs pure-chain skeleton: "
          f"{r['bf16'] / chain['bf16']:.2f} of the skeleton rate")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
