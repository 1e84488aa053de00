#!/usr/bin/env python
"""Benchmark: sampling AND training throughput of the flagship model.

Prints ONE JSON line. Headline metric = fused-sampler throughput (same metric
as round 1 for cross-round comparability); extra keys carry the training
numbers: train-step patches/s for the XLA path and the fused Pallas path
(ops/pallas_train.py) at the reference batch (138, ref:job_noise_flow.sh:35)
and at a large batch, plus rough model-FLOPs utilization.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
measured against a speed-of-light estimate for this chip. The sampling chain
runs as ONE fused Pallas kernel (ops/pallas_sample.py): the whole 10-layer
flow stays in VMEM, channel mixing rides the MXU as banded 128x128 matmuls.
The v2 fold packs the coupling NN's input H-taps and the zero-conv's
shift/log-scale outputs into single 128-lane tiles, cutting the chain to ~59
MFLOP/patch (8 couplings x 6 matmuls + 8 invertible-1x1), so
SoL = peak_matmul_flops / flops_per_patch. vs_baseline ~ 1.0 means the fused
chain saturates the MXU.

Self-verification (VERDICT r3 item 1) — the tunneled chip is multi-tenant
and its available rate drifts on day scale (the unchanged binary measured
2.17-2.18M patches/s through round 2 and 1.83-1.86M all of round-3 day).
So the bench now runs an in-process pure-MXU probe (fixed 4096^3 bf16
matmul, known SoL) before and after the sampler windows and records it as
`chip_probe_tflops`; `vs_baseline` stays the raw nominal-peak number, and
`vs_baseline_probe` renormalizes by what the chip demonstrably sustained
DURING this run — a reader can now tell "chip was busy" (probe low, ratio
steady) from "code got slower" (probe steady, ratio down).

FLOP accounting is reported both ways: the `*_padded` numbers count every
entry of the 128x128 band matrices as useful (the MXU really does execute
them), while `*_useful` scales by the measured nonzero fraction of the
folded matrices (`useful_frac_*`) — the algorithmically necessary FLOPs.
Measured on the published arch: useful_frac_sample 0.029, useful_frac_train
0.025 — a width-4 flow occupies ~3% of a 128x128 systolic array, so
mfu_useful ~0.016 (sampling) / ~0.010 (train) is the honest number. The
padded decomposition still wins by 17x over the densest practical
alternative (the fully-fused XLA graph, ~126k patches/s, whose small convs
can't tile the MXU at all): it trades a 35x padded-FLOP blowup for keeping
the whole 10-layer chain in VMEM at MXU rate. The "near the practical roof"
claim is about padded utilization of THIS decomposition.

First probe reading (2026-08-21, BENCH_r04): chip_probe 66.6-69.3 TFLOP/s
vs 197 nominal — a plain dense bf16 matmul at 34% of peak proves heavy
external tenancy on the shared chip; the sampler's raw vs_baseline 0.56
(vs 0.65 in round 2) is explained by that, and vs_baseline_probe 1.6 shows
the fused kernel retains its rate under contention BETTER than a dense
matmul does (one long kernel per dispatch vs 20 interleavable calls), so
probe-normalization is an upper bound. Read vs_baseline alongside the probe:
probe at ~nominal + vs_baseline down => code regression; probe depressed =>
tenancy.

Where the remaining SoL gap lives (measured on TPU v5e by op-substitution and
config sweeps, round 2): NOT in transcendentals, the in-kernel PRNG, or the
select masks (each < 1%, measured by patching them out); the two lane-rolls
per coupling cost ~6% total (cheaper than the 3 extra band matmuls that would
remove them); bt in {64..512} and parallel grid semantics are flat (v5e has
one TensorCore). The rest is MXU latency of the strictly dependent K=128
matmul chain inside each block, against a SoL denominator that counts the
band matrices' structural zeros (~2/3 of each 128x128) as useful FLOPs —
i.e. the kernel is near the practical roof for this decomposition.
"""

import json
import os
import signal
import time

import numpy as np


class _Timeout(Exception):
    pass


def _run_bounded(fn, seconds: float):
    """Run fn() with a SIGALRM deadline (tunneled-TPU compiles are
    high-variance; a slow compile must not starve the headline metric or
    blow the driver's overall budget). Returns None on timeout."""

    def handler(signum, frame):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(1, int(seconds)))
    try:
        return fn()
    except _Timeout:
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _train_batch(b):
    rng = np.random.default_rng(0)
    clean = rng.uniform(0.01, 0.9, (b, 32, 32, 4)).astype(np.float32)
    x = (rng.standard_normal((b, 32, 32, 4)) *
         np.sqrt(0.000479 * clean + 2e-6)).astype(np.float32)
    return {"_x": x, "_y": clean,
            "nlf0": np.full((b,), 0.000479, np.float32),
            "nlf1": np.full((b,), 2e-6, np.float32),
            "iso": np.full((b,), 100.0, np.float32),
            "cam": np.full((b,), 2.0, np.float32)}


def bench_train(batch_size: int, use_pallas: bool, n_iter: int,
                steps_per_call: int = 1):
    """Train-step patches/s for the published arch (one device).

    steps_per_call > 1 measures the lax.scan multi-step dispatch
    (Trainer.train_epoch(steps_per_call=K)) on a device-resident batch
    stack — the steady-state shape of a real epoch loop."""
    import jax

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.parallel.mesh import make_mesh, shard_batch_stacked
    from noise_flow_tpu.training.trainer import Trainer

    cfg = default_config(patch_height=32, use_pallas=use_pallas)
    trainer = Trainer(NoiseFlow((32, 32, 4), cfg), cfg, mesh=make_mesh(1))
    if use_pallas and not trainer.use_fused:
        return None
    mb = _train_batch(batch_size)
    if steps_per_call > 1:
        k = steps_per_call
        stacked = {key: np.broadcast_to(v, (k,) + v.shape)
                   for key, v in mb.items()}
        ds = shard_batch_stacked(trainer.mesh, stacked)

        def once():
            out = trainer._train_scan(trainer.params, trainer.state,
                                      trainer.opt_state, ds)
            (trainer.params, trainer.state, trainer.opt_state) = out[:3]
            return out[3]
    else:
        b = trainer._put(mb)

        def once():
            out = trainer._train_step(trainer.params, trainer.state,
                                      trainer.opt_state, b)
            (trainer.params, trainer.state, trainer.opt_state) = out[:3]
            return out[3]

    once().block_until_ready()  # compile
    warm = 3 if steps_per_call == 1 else 6
    for _ in range(warm):
        nll = once()
    nll.block_until_ready()
    calls = max(4, n_iter // steps_per_call)
    # best of 3 windows: the tunnel absorbs a deferred executable-warmup
    # cost AFTER the first calls return (measured: a window right after
    # compile can run 100x slow, the next at steady state), and the shared
    # chip shows minute-scale load variance
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(calls):
            nll = once()
        nll.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, batch_size * calls * steps_per_call / dt)
    assert np.all(np.isfinite(np.asarray(nll)))
    return best


def bench_chip_probe(n_iter: int = 20, windows: int = 3):
    """Pure-MXU contention probe: fixed 4096x4096x4096 bf16 matmul
    (137.4 GFLOP/call), best-of-windows TFLOP/s. Same dtype/shape class as
    the kernels' matmuls; its known SoL on an uncontended v5e is ~197 TFLOP/s
    bf16. Run in the SAME process right around the headline measurement so
    the JSON records what the (shared) chip actually sustained."""
    import jax
    import jax.numpy as jnp

    n = 4096
    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    a = jax.random.normal(k0, (n, n), jnp.bfloat16)
    b = jax.random.normal(k1, (n, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    mm(a, b).block_until_ready()  # compile
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = mm(a, b)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, 2.0 * n * n * n * n_iter / dt)
    return best / 1e12


def _useful_frac(mat_stacks) -> float:
    """Fraction of folded band-matrix entries that are nonzero — the
    algorithmically necessary share of the padded matmul FLOPs (each stack
    is a [n, ..., 128, 128] pile of per-matmul matrices over equal rows, so
    entry-weighting == FLOP-weighting)."""
    nnz = tot = 0
    for m in mat_stacks:
        arr = np.asarray(m)
        nnz += int(np.count_nonzero(arr))
        tot += arr.size
    return nnz / max(tot, 1)


def main():
    t_main = time.perf_counter()
    from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from noise_flow_tpu.config import default_config
    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.ops.pallas_sample import (
        build_sample_program, make_sampler)

    cfg = default_config(patch_height=32)
    flow = NoiseFlow((32, 32, 4), cfg)
    params, state = flow.init(jax.random.PRNGKey(0))
    program = build_sample_program(flow, params, state)

    on_tpu = jax.default_backend() == "tpu"
    batch = 8192 if on_tpu else 512
    mm_dtype = jnp.bfloat16
    bt = 64

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0.01, 0.9, (batch, 32, 32, 4)), jnp.float32)
    cond = {
        "clean": clean,
        "nlf0": jnp.full((batch,), 0.000479),
        "nlf1": jnp.full((batch,), 2e-6),
        "iso": jnp.full((batch,), 100.0),
        "cam": jnp.full((batch,), 2.0),
    }

    # steady-state sampling path: fixed (iso, cam) conditioning -> scale
    # coefficients precomputed once; eps drawn in-kernel (TPU PRNG); the
    # per-call host work is one int32 seed; output in the kernel's native
    # [B, 32, 128] tile layout (free host-side reshape to [B, 32, 32, 4]).
    sampler = make_sampler(program, cond, temp=0.6, bt=bt, mm_dtype=mm_dtype)
    sampler(1).block_until_ready()  # compile
    for i in range(5):              # warm the dispatch path
        out = sampler(2 + i)
    out.block_until_ready()

    # Tenancy-stable measurement (VERDICT r4 item 5): the tunneled chip is
    # multi-tenant with minute-scale load variance (the UNCHANGED sampler
    # binary measured 2.17-2.18M patches/s through round 2 and 1.83-1.86M all
    # of round-3 day). Each attempt runs the MXU probe then the headline
    # windows; attempts repeat (with a backoff) until the probe shows a
    # quiet chip (>= NF_QUIET_TFLOPS, default 150 of 197 nominal) or the
    # attempt/time budget runs out. The JSON records every (probe, rate)
    # pair: the headline `value` is the best window overall, and
    # `value_quiet` is the rate from the quietest attempt — the
    # round-over-round comparable number.
    n_iter = 20 if on_tpu else 5
    quiet_thresh = float(os.environ.get("NF_QUIET_TFLOPS", "150"))
    max_attempts = int(os.environ.get("NF_QUIET_ATTEMPTS", "4"))
    attempts = []
    samples_per_sec = 0.0
    probe_pre = probe_post = None
    for attempt in range(max_attempts if on_tpu else 1):
        probe_a = bench_chip_probe() if on_tpu else None
        rate_a = 0.0
        for w in range(5 if on_tpu else 1):
            t0 = time.perf_counter()
            for i in range(n_iter):
                out = sampler(100 + 1000 * w + 10000 * attempt + i)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            rate_a = max(rate_a, batch * n_iter / dt)
        probe_b = bench_chip_probe() if on_tpu else None
        if attempt == 0:
            probe_pre, probe_post = probe_a, probe_b
        attempts.append({"probe_pre": probe_a, "probe_post": probe_b,
                         "rate": rate_a})
        samples_per_sec = max(samples_per_sec, rate_a)
        if not on_tpu or min(probe_a, probe_b) >= quiet_thresh:
            break
        if attempt < max_attempts - 1:
            time.sleep(15)  # let the co-tenant's burst pass
    quietest = max(attempts,
                   key=lambda a: min(a["probe_pre"] or 0, a["probe_post"] or 0))
    value_quiet = quietest["rate"]
    probe_quiet = min(quietest["probe_pre"] or 0, quietest["probe_post"] or 0)

    # --- speed-of-light: MXU-compute-bound -----------------------------
    # v2 folded chain per patch: 8 couplings x 6 matmuls [*,128]x[128,128]
    # + 8 mix matmuls, each over 32 rows/patch at 2*128*128 flops/row
    per_row = (8 * 6 + 8) * (2 * 128 * 128)
    flops_per_patch = per_row * 32
    peak = 197e12 if (on_tpu and mm_dtype == jnp.bfloat16) else 45e12
    if not on_tpu:
        peak = 1e12  # CPU-ish; vs_baseline meaningless off-TPU
    sol = peak / flops_per_patch
    vs_baseline = samples_per_sec / sol
    # probe-normalized ratio, EXECUTED-FLOPs basis on both sides: the kernel
    # side counts every executed (padded-band) matmul FLOP and the probe is
    # a dense matmul whose executed == useful FLOPs — so this is the ratio
    # of sustained executed-matmul throughput under the SAME attempt's
    # tenancy (quietest attempt's rate over its own probe — mixing the best
    # rate with another attempt's best probe would overstate it), not a
    # fraction of speed-of-light. >1.0 means the one-long-kernel dispatch
    # shape retains MXU rate under contention better than 20 interleavable
    # dense calls do; on a quiet chip (probe ~ nominal) it converges to
    # vs_baseline. Read `value_quiet`/`probe_quiet` for the comparable
    # round-over-round number.
    vs_baseline_probe = (value_quiet / (probe_quiet * 1e12 / flops_per_patch)
                         if probe_quiet else None)
    # measured nonzero fraction of the folded sampler matrices (the
    # algorithmically necessary share of the padded matmul FLOPs)
    useful_frac_sample = _useful_frac(
        [program.mixes, program.m1as, program.m1bs, program.m2s,
         program.m3s])
    sample_mfu_padded = samples_per_sec * flops_per_patch / peak
    sample_mfu_useful = sample_mfu_padded * useful_frac_sample

    # --- training throughput (VERDICT r1 item 3) ------------------------
    # Most-important case first: each case may cost a fresh Mosaic compile
    # over the tunnel, so cases are individually SIGALRM-bounded and skipped
    # once the global budget (NF_BENCH_BUDGET_S) is spent — the headline
    # sampling metric above is already banked either way.
    # Round-2 fit: fused step time t = a + c*batch with a ~ 2.0 ms fixed
    # per-step overhead and c ~ 3.1 us/patch. Round 3 attacked `a` three
    # ways (experiments/train_overhead.py): the param->band fold is one
    # einsum per conv (was a kron per tap), Adam runs optax.flatten'd on one
    # fused vector (was 143 leaves ~ 300 kernel launches), and the b138
    # cases dispatch 16 steps per call via lax.scan (per-call cost on this
    # setup scales with argument-handle count). Measured fused b138:
    # 51k (r2) -> 62k (fold+flatten) -> 84k patches/s (scan16). The XLA
    # path is HBM-bound and peaks near batch 2048.
    # Round 3 then attacked `c`: the attribution probe
    # (experiments/train_attrib.py) showed the custom_vjp segment path runs
    # the forward twice (primal kernel + the backward kernel's in-VMEM
    # recompute) and pays the ghost-BN moment reductions twice. Since the
    # mean-NLL cotangents are analytic (dnll/dz = z/B, dnll/dldj = -1/B),
    # the one-shot kernel (pallas_train.FusedTrainStep, cfg.pallas_oneshot,
    # default on) computes loss AND all grads in one pass: fused big-batch
    # 273k -> 346k patches/s, MFU 0.33 -> 0.41.
    n_tr = 30 if on_tpu else 2
    big_fused = 8192 if on_tpu else 64
    big_xla = 2048 if on_tpu else 64
    # b138 cases run 16 steps per dispatch (lax.scan) — round 3: per-call
    # overhead on this setup scales with argument-handle count, so the
    # multi-step dispatch is the steady-state epoch-loop shape (84k vs 51k
    # patches/s measured at b138 fused). Round 5 attacked the remaining
    # glue (batched fold, bt=69 blocks, stacked scale probes): b138 full
    # step 1617 -> 1064 us in-situ (~130k patches/s); the residue is a
    # measured ~350 us in-call kernel floor — see experiments/b138_floor.md.
    # big-batch cases stay step-per-call: the fixed overhead is ~7% there
    # and the scan-of-Mosaic compile for the 8192 shape costs many minutes
    # over the tunnel.
    cases = [("train_fused_big", big_fused, True, 1),
             ("train_fused_b138", 138, True, 32),
             ("train_xla_b138", 138, False, 32),
             ("train_xla_big", big_xla, False, 1)]
    if not on_tpu:  # interpret-mode kernels are slow; keep CI cheap
        cases = [("train_xla_b138", 32, False, 2),
                 ("train_fused_b138", 32, True, 1)]
    deadline = t_main + float(os.environ.get("NF_BENCH_BUDGET_S", "2400"))
    tr = {}
    for name, bsz, fused, spc in cases:
        left = deadline - time.perf_counter()
        if left < 60:
            tr[name] = None
            print(f"# {name} skipped: bench budget spent", flush=True)
            continue
        try:
            tr[name] = _run_bounded(
                lambda: bench_train(bsz, fused, n_tr, steps_per_call=spc),
                left)
            if tr[name] is None:
                print(f"# {name} timed out", flush=True)
        except Exception as e:  # pragma: no cover - bench resilience
            tr[name] = None
            print(f"# {name} failed: {e!r}", flush=True)
    # model-FLOPs utilization of the fused train step: fwd ~59 MFLOP/patch
    # (padded-band count), bwd recompute+reverse ~3x fwd => ~4x per step
    train_flops_per_patch = 4 * flops_per_patch
    best_tr = max((v for v in tr.values() if v), default=None)
    train_mfu = (best_tr * train_flops_per_patch / peak) if best_tr else None
    # measured nonzero fraction of the one-shot train kernel's forward
    # matrices (the backward reuses the same matrices transposed; the dense
    # wgrad matmuls are genuinely useful, so this slightly UNDERstates the
    # useful share of a train step)
    useful_frac_train = None
    try:
        from noise_flow_tpu.ops.pallas_train import FusedTrainStep
        fs = FusedTrainStep(flow, bt=8)
        cond2 = {k: v[:2] for k, v in cond.items()}
        cond2["clean"] = cond2["clean"].reshape(2, 32, 128)
        mats, _, _, _, _ = fs._prep(params, state, cond2, 2)
        useful_frac_train = _useful_frac(
            [mats["mixes"], mats["m1s"], mats["m2s"], mats["m3s"]])
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"# train useful-frac probe failed: {e!r}", flush=True)
    train_mfu_useful = (train_mfu * useful_frac_train
                        if train_mfu and useful_frac_train else None)

    rnd = lambda v, n=4: (round(v, n) if v is not None else None)  # noqa: E731
    print(json.dumps({
        "metric": "noiseflow_fused_sample_throughput",
        "value": round(samples_per_sec, 1),
        "unit": "patches/s",
        "vs_baseline": round(vs_baseline, 4),
        "vs_baseline_probe": rnd(vs_baseline_probe),
        "value_quiet": round(value_quiet, 1),
        "probe_quiet_tflops": rnd(probe_quiet, 1),
        "quiet": bool(probe_quiet >= quiet_thresh) if on_tpu else None,
        "attempts": [{k: rnd(v, 1) for k, v in a.items()}
                     for a in attempts],
        "chip_probe_tflops": {"pre": rnd(probe_pre, 1),
                              "post": rnd(probe_post, 1),
                              "nominal_peak": peak / 1e12},
        "sample_mfu_padded": rnd(sample_mfu_padded),
        "sample_mfu_useful": rnd(sample_mfu_useful),
        "useful_frac_sample": rnd(useful_frac_sample),
        "train_patches_per_sec": {k: (round(v, 1) if v else None)
                                  for k, v in tr.items()},
        "train_mfu_best": rnd(train_mfu),
        "train_mfu_useful": rnd(train_mfu_useful),
        "useful_frac_train": rnd(useful_frac_train),
    }))


if __name__ == "__main__":
    main()
