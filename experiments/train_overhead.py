"""Attribute the fused train step's fixed per-step overhead (round 3).

Times, on the real chip at batch 138 and 2048:
- full fused train step (Trainer._train_step)
- the differentiable param->band fold alone
- the Adam update alone (143 tiny leaves)
- fused loss forward only (no grad)

Usage: python experiments/train_overhead.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from noise_flow_tpu.config import default_config  # noqa: E402
from noise_flow_tpu.models.flow import NoiseFlow  # noqa: E402
from noise_flow_tpu.parallel.mesh import make_mesh  # noqa: E402
from noise_flow_tpu.training.trainer import Trainer  # noqa: E402


def timeit(fn, n=50, chain=None):
    out = fn()
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def batch(b):
    rng = np.random.default_rng(0)
    clean = rng.uniform(0.01, 0.9, (b, 32, 32, 4)).astype(np.float32)
    x = (rng.standard_normal((b, 32, 32, 4)) *
         np.sqrt(0.000479 * clean + 2e-6)).astype(np.float32)
    return {"_x": x, "_y": clean,
            "nlf0": np.full((b,), 0.000479, np.float32),
            "nlf1": np.full((b,), 2e-6, np.float32),
            "iso": np.full((b,), 100.0, np.float32),
            "cam": np.full((b,), 2.0, np.float32)}


def main():
    cfg = default_config(patch_height=32, use_pallas=True)
    flow = NoiseFlow((32, 32, 4), cfg)
    trainer = Trainer(flow, cfg, mesh=make_mesh(1))
    params, state = trainer.params, trainer.state

    # --- fold alone --------------------------------------------------------
    ff = trainer._fused_for_batch(138)
    from noise_flow_tpu.ops.pallas_train import _fold_segment

    seg_items = [it for it in ff.plan if it[0] == "segment"]

    @jax.jit
    def fold_all(p, s):
        outs = []
        for _, seg, lo, hi in seg_items:
            specs = flow.level_specs[0]
            mats, mld = _fold_segment(seg, specs[lo:hi],
                                      p["layers"][0][lo:hi],
                                      s["layers"][0][lo:hi], cfg, cfg.width)
            outs.append((mats["m1s"], mld))
        return outs

    t_fold = timeit(lambda: fold_all(params, state))
    print(f"fold alone        : {t_fold*1e3:8.3f} ms")

    # --- adam alone --------------------------------------------------------
    opt = optax.adam(1e-4)
    ostate = opt.init(params)
    g = jax.tree_util.tree_map(lambda x: x * 1e-3, params)

    @jax.jit
    def adam_step(p, o, g):
        u, o2 = opt.update(g, o, p)
        return optax.apply_updates(p, u), o2

    t_adam = timeit(lambda: adam_step(params, ostate, g))
    print(f"adam (143 leaves) : {t_adam*1e3:8.3f} ms")

    optf = optax.flatten(optax.adam(1e-4))
    ostate_f = optf.init(params)

    @jax.jit
    def adam_flat(p, o, g):
        u, o2 = optf.update(g, o, p)
        return optax.apply_updates(p, u), o2

    t_adamf = timeit(lambda: adam_flat(params, ostate_f, g))
    print(f"adam (flattened)  : {t_adamf*1e3:8.3f} ms")

    # --- loss fwd only / full step -----------------------------------------
    for b in (138, 2048):
        mb = trainer._put(batch(b))

        @jax.jit
        def loss_only(p, s, mb):
            return trainer._fused_loss(p, s, mb, train=True)[0]

        t_loss = timeit(lambda: loss_only(params, state, mb))

        def step():
            out = trainer._train_step(trainer.params, trainer.state,
                                      trainer.opt_state, mb)
            trainer.params, trainer.state, trainer.opt_state = out[:3]
            return out[3]

        t_step = timeit(step)
        print(f"b={b:5d} loss fwd  : {t_loss*1e3:8.3f} ms"
              f"   full step: {t_step*1e3:8.3f} ms"
              f"   ({b/t_step:,.0f} patches/s)")


if __name__ == "__main__":
    main()
