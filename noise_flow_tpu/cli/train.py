"""Training driver CLI.

TPU-native re-design of ref:train_noise_flow.py:217-541: the reference's
hogwild thread pool + feed_dict session becomes one jitted sharded train step;
the 4-stage queue pipeline becomes a vectorized in-memory patch dataset.
The observable surface matches: hps.txt / model_vars.txt dumps, TSV logs
(train/test/sample.txt), per-epoch console line, baseline NLL columns,
best-model checkpointing.

Run (canonical published config, ref:job_noise_flow.sh:35-39):
    python -m noise_flow_tpu.cli.train \
        --arch "sdn5|unc|unc|unc|unc|gain4|unc|unc|unc|unc" --width 4 \
        --lr 1e-4 --n_batch_train 138 --patch_height 32 \
        --n_patches_per_image 2898 --epochs 2000 --logdir exp/nf
Smoke run without SIDD:
    python -m noise_flow_tpu.cli.train --synthetic_data 4 --epochs 20 \
        --patch_height 16 --n_batch_train 16 --lr 1e-2 --logdir /tmp/nf
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import List, Optional

import numpy as np

from noise_flow_tpu.cli.args import parse_config
from noise_flow_tpu.config import save_hps
from noise_flow_tpu.data.patches import PatchDataset
from noise_flow_tpu.data.sidd import load_image_tuple, sidd_filename_tuples
from noise_flow_tpu.data.stats import calc_baselines, calc_pat_stats
from noise_flow_tpu.data.synthetic import make_synthetic_samples
from noise_flow_tpu.utils.logger import add_trace_level


def load_split(args, cfg, train_or_test: str):
    """SIDD images (or synthetic fixtures) -> PatchDataset."""
    if args.synthetic_data:
        n = args.synthetic_data
        seed = 0 if train_or_test == "train" else 9
        samples = make_synthetic_samples(
            n_images=n, h=4 * cfg.patch_height, w=4 * cfg.patch_height,
            iso=args.iso or 100, seed=seed)
    else:
        first = cfg.start_tr_im_idx if train_or_test == "train" else cfg.start_ts_im_idx
        last = cfg.end_tr_im_idx if train_or_test == "train" else cfg.end_ts_im_idx
        tuples, n_inst = sidd_filename_tuples(
            cfg.sidd_path, train_or_test, first, last,
            cam=args.camera, iso=args.iso)
        if not tuples:
            raise FileNotFoundError(
                f"no SIDD scene instances under {cfg.sidd_path!r} "
                f"(need SIDD_Medium_Raw; or pass --synthetic_data N)")
        logging.info("%s split: %d instances, %d image tuples",
                     train_or_test, n_inst, len(tuples))
        samples = [load_image_tuple(t) for t in tuples]
    return PatchDataset(samples, cfg.patch_height, cfg.n_patches_per_image,
                        sampling=cfg.patch_sampling, seed=cfg.seed)


def main(argv: Optional[List[str]] = None) -> int:
    args, cfg = parse_config(argv)
    from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    add_trace_level()
    logging.basicConfig(level=logging.INFO)
    t_start = time.time()

    # data + stats + analytic baselines (ref:train_noise_flow.py:264-280)
    tr = load_split(args, cfg, "train")
    ts = load_split(args, cfg, "test")
    logging.info("train patches: %d, test patches: %d", len(tr), len(ts))
    stats = calc_pat_stats(tr.x, tr.y)
    nll_gauss, nll_sdn = calc_baselines(
        ts.batches(cfg.n_batch_test, drop_remainder=True), stats["sc_in_vr"])
    logging.info("baselines: NLL_G=%.3f NLL_SDN=%.3f", nll_gauss, nll_sdn)

    # model + trainer (imports deferred so --help works without jax init)
    import jax

    from noise_flow_tpu.models.flow import NoiseFlow
    from noise_flow_tpu.parallel.mesh import make_mesh
    from noise_flow_tpu.training.trainer import Trainer

    flow = NoiseFlow(cfg.x_shape, cfg)
    mesh = make_mesh(args.mesh or None)
    trainer = Trainer(flow, cfg, mesh)
    n_params = flow.num_params(trainer.params)
    logging.info("model: %s | %d params | mesh %s",
                 cfg.arch or f"revnet({cfg.sidd_cond})", n_params,
                 tuple(mesh.shape.values()))

    # config + variable dumps (ref:train_noise_flow.py:305-312)
    os.makedirs(cfg.logdir, exist_ok=True)
    save_hps(os.path.join(cfg.logdir, "hps.txt"), cfg,
             flow.get_layer_names(), n_params)
    with open(os.path.join(cfg.logdir, "model_vars.txt"), "w") as f:
        for path, leaf in jax.tree_util.tree_flatten_with_path(trainer.params)[0]:
            key = "/".join(str(p) for p in path)
            f.write(f"{key}\t{tuple(np.shape(leaf))}\n")

    # clamp batch sizes to split sizes (small synthetic smoke runs would
    # otherwise drop every batch under drop_remainder)
    bs_tr = min(cfg.n_batch_train, len(tr))
    bs_ts = min(cfg.n_batch_test, len(ts))
    bsc = not cfg.per_example_cond  # reference-compat conditioning
    trainer.fit(
        lambda: tr.batches(bs_tr, shuffle=True, seed=cfg.seed,
                           drop_remainder=True, batch_scalar_cond=bsc),
        lambda: ts.batches(bs_ts, drop_remainder=True, batch_scalar_cond=bsc),
        cfg.logdir, epochs=cfg.epochs, nll_gauss=nll_gauss, nll_sdn=nll_sdn,
        sc_sd=stats["sc_in_sd"], do_sampling=args.do_sample, verbose=True)

    total = time.time() - t_start
    with open(os.path.join(cfg.logdir, "total_time.txt"), "w") as f:
        f.write(f"{total:.1f}\n")  # (ref:train_noise_flow.py:539-540)
    logging.info("done in %.1fs", total)
    return 0


if __name__ == "__main__":
    sys.exit(main())
