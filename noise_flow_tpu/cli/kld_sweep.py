"""KLD-vs-temperature sweep over a trained model, per (camera, ISO).

The experiment behind ref:plotting/plot_kldiv_vs_temp.py, made runnable in
one command (the reference required a training run with per-epoch sampling
plus an offline plotting script). For every (cam, iso) group present in the
test split and every temperature, noise is sampled on-device — the batch
sharded over the data mesh, XLA inserting the collectives — and the marginal
KLD of {Gaussian, camera-NLF, NoiseFlow} vs real noise is computed with the
reference's histogram estimator (ref:sidd_utils.py:995-1058).

Run:
    python -m noise_flow_tpu.cli.kld_sweep --model_dir models/NoiseFlow \
        --synthetic_data 4 --temps 0.2,0.4,0.6,0.8,1.0 --logdir exp/kld
(accepts the reference's shipped TF model directory directly.)
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import List, Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", type=str, required=True,
                   help="trained model dir (hps.txt + ckpt; npz or TF format)")
    p.add_argument("--sidd_path", type=str, default=None)
    p.add_argument("--synthetic_data", type=int, default=0, metavar="N")
    p.add_argument("--temps", type=str, default="0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0")
    p.add_argument("--cam", type=str, default=None)
    p.add_argument("--iso", type=int, default=None)
    p.add_argument("--n_batch", type=int, default=138)
    p.add_argument("--n_patches_per_image", type=int, default=128)
    p.add_argument("--max_batches_per_group", type=int, default=4)
    p.add_argument("--logdir", type=str, default="./experiments/sidd/kld_sweep")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _load_patches(args, cfg):
    from noise_flow_tpu.data.patches import PatchDataset
    if args.synthetic_data:
        from noise_flow_tpu.data.synthetic import make_synthetic_samples
        samples = make_synthetic_samples(
            n_images=args.synthetic_data, h=4 * cfg.patch_height,
            w=4 * cfg.patch_height, iso=args.iso or 100, seed=9)
    else:
        from noise_flow_tpu.data.sidd import (
            load_image_tuple, sidd_filename_tuples)
        tuples, _ = sidd_filename_tuples(
            args.sidd_path or cfg.sidd_path, "test",
            cfg.start_ts_im_idx, cfg.end_ts_im_idx,
            cam=args.cam, iso=args.iso)
        if not tuples:
            raise FileNotFoundError("no SIDD test instances found; pass "
                                    "--sidd_path or --synthetic_data N")
        samples = [load_image_tuple(t) for t in tuples]
    return PatchDataset(samples, cfg.patch_height, args.n_patches_per_image)


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    temps = [float(t) for t in args.temps.split(",")]

    import jax
    import jax.numpy as jnp

    from noise_flow_tpu.data.stats import calc_pat_stats
    from noise_flow_tpu.parallel.mesh import batch_sharding, make_mesh
    from noise_flow_tpu.utils.metrics import calc_kldiv_mb
    from noise_flow_tpu.wrapper import NoiseFlowWrapper

    nf = NoiseFlowWrapper(args.model_dir, sampling_temperature=temps[0])
    cfg = nf.cfg
    ds = _load_patches(args, cfg)
    stats = calc_pat_stats(ds.x, ds.y)
    mesh = make_mesh()
    sh = batch_sharding(mesh)
    logging.info("sweep: %d patches, %d temps, mesh %s",
                 len(ds), len(temps), tuple(mesh.shape.values()))

    flow = nf.flow
    sample_jit = jax.jit(
        lambda p, st, k, cond, t: flow.sample(
            p, st, k, cond, temp=t, batch=cond["clean"].shape[0],
            train=nf.bn_batch_stats),
        static_argnums=(4,))

    # group patches by (cam, iso) — the per-condition sweep of BASELINE cfg 4
    keys = sorted({(float(c), float(i)) for c, i in zip(ds.cam, ds.iso)})
    os.makedirs(args.logdir, exist_ok=True)
    out_rows = []
    rng = jax.random.PRNGKey(args.seed)
    for cam_v, iso_v in keys:
        idx = np.where((ds.cam == cam_v) & (ds.iso == iso_v))[0]
        nb = max(len(idx) // args.n_batch, 1)
        nb = min(nb, args.max_batches_per_group)
        for t in temps:
            klds = []
            for bi in range(nb):
                sel = idx[bi * args.n_batch:(bi + 1) * args.n_batch]
                if len(sel) == 0:
                    continue
                mb = {"_x": ds.x[sel], "_y": ds.y[sel], "pid": ds.pid[sel],
                      "nlf0": ds.nlf0[sel], "nlf1": ds.nlf1[sel],
                      "iso": ds.iso[sel], "cam": ds.cam[sel]}
                cond = {
                    "clean": jax.device_put(mb["_y"], sh),
                    "nlf0": jax.device_put(mb["nlf0"], sh),
                    "nlf1": jax.device_put(mb["nlf1"], sh),
                    "iso": jax.device_put(mb["iso"], sh),
                    "cam": jax.device_put(mb["cam"], sh),
                }
                rng, k = jax.random.split(rng)
                xs = np.asarray(sample_jit(nf.params, nf.state, k, cond,
                                           float(t)))
                klds.append(calc_kldiv_mb(mb, xs, stats["sc_in_sd"]))
            kld = np.mean(np.stack(klds), axis=0)
            out_rows.append((cam_v, iso_v, t, *kld))
            logging.info("cam=%g iso=%g temp=%.2f  KLD_G=%.4f KLD_NLF=%.4f "
                         "KLD_NF=%.4f", cam_v, iso_v, t, kld[0], kld[1],
                         kld[2])

    tsv = os.path.join(args.logdir, "kld_vs_temp.txt")
    with open(tsv, "w") as f:
        f.write("cam\tiso\ttemp\tKLD_G\tKLD_NLF\tKLD_NF\tKLD_R\n")
        for row in out_rows:
            f.write("\t".join(f"{v:g}" for v in row) + "\n")
    logging.info("wrote %s", tsv)

    # one plot per (cam, iso)
    try:
        from noise_flow_tpu.analysis.plots import plot_kld_vs_temp
        for cam_v, iso_v in keys:
            rows = np.asarray([r[2:] for r in out_rows
                               if r[0] == cam_v and r[1] == iso_v])
            plot_kld_vs_temp(rows[:, 0], rows[:, 1:], os.path.join(
                args.logdir, f"kld_vs_temp_cam{cam_v:g}_iso{iso_v:g}.png"))
    except Exception as e:  # matplotlib optional in minimal envs
        logging.warning("plotting skipped: %s", e)
    return 0


if __name__ == "__main__":
    sys.exit(main())
