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
    """SIDD images (or synthetic fixtures) -> PatchDataset.

    Production input path: with --cache_dir the decoded .MAT images are
    materialized once as npy (data/cache.py) and re-read from there on
    subsequent runs — the reference re-decoded every .MAT per epoch through
    8 ImageLoader threads (ref:sidd/ImageLoader.py:36-78)."""
    if args.synthetic_data:
        n = args.synthetic_data
        seed = 0 if train_or_test == "train" else 9
        samples = make_synthetic_samples(
            n_images=n, h=4 * cfg.patch_height, w=4 * cfg.patch_height,
            iso=args.iso or 100, seed=seed)
    else:
        from noise_flow_tpu.data.bootstrap import check_download_sidd
        check_download_sidd(cfg.sidd_path,
                            allow_download=getattr(args, "download_sidd", False))
        first = cfg.start_tr_im_idx if train_or_test == "train" else cfg.start_ts_im_idx
        last = cfg.end_tr_im_idx if train_or_test == "train" else cfg.end_ts_im_idx
        max_inst = args.n_tr_inst if train_or_test == "train" else args.n_ts_inst
        cache_dir = None
        if args.cache_dir:
            cache_dir = os.path.join(args.cache_dir, train_or_test)
        if cache_dir and os.path.exists(
                os.path.join(cache_dir, "index.json")):
            from noise_flow_tpu.data.cache import load_cached_samples
            samples = load_cached_samples(cache_dir)
            logging.info("%s split: %d images from cache %s",
                         train_or_test, len(samples), cache_dir)
        else:
            tuples, n_inst = sidd_filename_tuples(
                cfg.sidd_path, train_or_test, first, last,
                cam=args.camera, iso=args.iso, max_instances=max_inst)
            if not tuples:
                raise FileNotFoundError(
                    f"no SIDD scene instances under {cfg.sidd_path!r} "
                    f"(need SIDD_Medium_Raw; or pass --synthetic_data N)")
            import jax
            if jax.process_count() > 1:
                # per-host file shard: every host enumerates the identical
                # global list, takes a disjoint slice (SURVEY.md §2.6)
                from noise_flow_tpu.parallel.distributed import host_shard
                tuples = host_shard(tuples)
            logging.info("%s split: %d instances, %d image tuples (host %d)",
                         train_or_test, n_inst, len(tuples),
                         jax.process_index())
            samples = [load_image_tuple(t) for t in tuples]
            if cache_dir:
                from noise_flow_tpu.data.cache import write_cache_from_samples
                write_cache_from_samples(samples, cache_dir)
                logging.info("wrote npy cache to %s", cache_dir)
    return PatchDataset(samples, cfg.patch_height, cfg.n_patches_per_image,
                        sampling=cfg.patch_sampling, seed=cfg.seed,
                        shuffle_patches=args.shuffle_patches)


def main(argv: Optional[List[str]] = None) -> int:
    args, cfg = parse_config(argv)
    from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    add_trace_level()
    logging.basicConfig(level=logging.INFO)
    t_start = time.time()

    # multi-host bootstrap must precede any jax device use (SURVEY.md §2.6)
    if args.coordinator_address:
        from noise_flow_tpu.parallel.distributed import initialize_distributed
        initialize_distributed(args.coordinator_address, args.num_processes,
                               args.process_id)

    # data + stats + analytic baselines (ref:train_noise_flow.py:264-280);
    # multi-host: Welford pieces merged across host shards, baselines averaged
    tr = load_split(args, cfg, "train")
    ts = load_split(args, cfg, "test")
    logging.info("train patches: %d, test patches: %d", len(tr), len(ts))
    # host-side Welford + baselines over a full-scale split cost minutes;
    # with --cache_dir (immutable decoded data) they are cached alongside it
    stats_cache = (os.path.join(args.cache_dir, "pat_stats_baselines.npz")
                   if args.cache_dir else None)
    # cached stats depend on the patch-extraction config AND the data, not
    # just the cache dir: re-running with different extraction args or a
    # regenerated dataset (same sizes, different content) must recompute,
    # not silently load stale sc_sd/baselines

    def content_sig(arr):
        """Strided sample moments across the whole patch set — cheap, and a
        same-size regeneration with different content changes it."""
        sub = np.asarray(arr[::max(1, len(arr) // 64)]).reshape(-1)
        sub = sub[::max(1, sub.size // 65536)]
        return (round(float(sub.mean()), 9), round(float(sub.std()), 9))

    fingerprint = repr((len(tr), len(ts), cfg.patch_height,
                        cfg.n_patches_per_image, cfg.patch_sampling,
                        min(cfg.n_batch_test, len(ts)), cfg.camera, cfg.iso,
                        args.shuffle_patches, cfg.seed,
                        content_sig(tr.x), content_sig(ts.x)))
    cached = None
    if stats_cache and os.path.exists(stats_cache):
        z = np.load(stats_cache)
        if "fingerprint" in z.files and str(z["fingerprint"]) == fingerprint:
            cached = z
        else:
            logging.info("stats cache %s fingerprint mismatch "
                         "(extraction config changed) — recomputing",
                         stats_cache)
    if cached is not None:
        z = cached
        stats = {k: float(z[k]) for k in z.files
                 if k not in ("nll_gauss", "nll_sdn", "fingerprint")}
        nll_gauss, nll_sdn = float(z["nll_gauss"]), float(z["nll_sdn"])
        logging.info("stats+baselines from %s", stats_cache)
    else:
        from noise_flow_tpu.parallel.distributed import (
            global_baselines, global_scalar_stats)
        stats = global_scalar_stats(tr.x, tr.y)
        # clamp the baseline batch to the split size: with a tiny smoke
        # split, drop_remainder at the full n_batch_test would yield ZERO
        # batches and nan baseline columns in every log row
        bs_base = min(cfg.n_batch_test, len(ts))
        nll_gauss, nll_sdn = calc_baselines(
            ts.batches(bs_base, drop_remainder=True), stats["sc_in_vr"])
        nll_gauss, nll_sdn = global_baselines(nll_gauss, nll_sdn)
        if stats_cache:
            np.savez(stats_cache, nll_gauss=nll_gauss, nll_sdn=nll_sdn,
                     fingerprint=fingerprint, **stats)
    logging.info("baselines: NLL_G=%.3f NLL_SDN=%.3f", nll_gauss, nll_sdn)

    # --calc_*_only early exits (ref:Initialization.py:31-75 modes)
    if args.calc_pat_stats_and_baselines_only:
        os.makedirs(cfg.logdir, exist_ok=True)
        np.save(os.path.join(cfg.logdir, "pat_stats.npy"),
                {**stats, "nll_gauss": nll_gauss, "nll_sdn": nll_sdn},
                allow_pickle=True)
        logging.info("stats+baselines written to %s/pat_stats.npy; exiting",
                     cfg.logdir)
        return 0
    if args.calc_hists_only:
        from noise_flow_tpu.data.histograms import (
            calc_hists, plot_hists, save_hists)
        hx = calc_hists([{"noise": tr.x, "clean": tr.y}])
        hy = calc_hists([{"noise": ts.x, "clean": ts.y}])
        os.makedirs(cfg.logdir, exist_ok=True)
        save_hists(cfg.logdir, hx, hy)
        plot_hists(hx, hy, cfg.logdir)
        logging.info("histograms written to %s; exiting", cfg.logdir)
        return 0

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

    # config + variable dumps (ref:train_noise_flow.py:305-312); args-only
    # provenance flags go in too so a synthetic-data run is distinguishable
    # from a real-SIDD run when reading the artifacts
    os.makedirs(cfg.logdir, exist_ok=True)
    save_hps(os.path.join(cfg.logdir, "hps.txt"), cfg,
             flow.get_layer_names(), n_params,
             extra={"synthetic_data": args.synthetic_data,
                    "native_loader": bool(args.native_loader),
                    "cache_dir": args.cache_dir or "",
                    "num_processes": jax.process_count()})
    with open(os.path.join(cfg.logdir, "model_vars.txt"), "w") as f:
        for path, leaf in jax.tree_util.tree_flatten_with_path(trainer.params)[0]:
            key = "/".join(str(p) for p in path)
            f.write(f"{key}\t{tuple(np.shape(leaf))}\n")

    # clamp batch sizes to split sizes (small synthetic smoke runs would
    # otherwise drop every batch under drop_remainder). Multi-host: the CLI
    # batch size is GLOBAL; each host feeds its share, and every host must
    # run the same number of steps per epoch (min across hosts).
    pc = jax.process_count()
    bs_tr = min(max(cfg.n_batch_train // pc, 1), len(tr))
    bs_ts = min(max(cfg.n_batch_test // pc, 1), len(ts))
    steps_tr = steps_ts = None
    if pc > 1:
        from jax.experimental import multihost_utils
        counts = np.asarray(multihost_utils.process_allgather(
            np.asarray([len(tr) // bs_tr, len(ts) // bs_ts], np.int32)))
        steps_tr, steps_ts = int(counts[:, 0].min()), int(counts[:, 1].min())

    def limit(it, n):
        import itertools
        return it if n is None else itertools.islice(it, n)

    bsc = not cfg.per_example_cond  # reference-compat conditioning

    def scalarize(it):
        if not bsc:
            yield from it
            return
        for mb in it:
            mb = dict(mb)
            for k in ("nlf0", "nlf1", "iso", "cam"):
                mb[k] = np.full_like(mb[k], mb[k][-1])
            yield mb

    if args.native_loader:
        # C++ threaded pipeline over the npy cache: decode, patch extraction
        # and batch assembly off the Python thread (data/native.py)
        if not args.cache_dir:
            raise SystemExit("--native_loader requires --cache_dir")
        from noise_flow_tpu.data.native import NativePatchLoader
        tr_loader = NativePatchLoader(
            os.path.join(args.cache_dir, "train"), cfg.patch_height, bs_tr,
            cfg.n_patches_per_image, shuffle=True, seed=cfg.seed,
            sampling=cfg.patch_sampling)
        ts_loader = NativePatchLoader(
            os.path.join(args.cache_dir, "test"), cfg.patch_height, bs_ts,
            cfg.n_patches_per_image, shuffle=False, seed=cfg.seed,
            sampling=cfg.patch_sampling)
        train_fn = lambda: limit(scalarize(tr_loader.epoch()), steps_tr)
        test_fn = lambda: limit(scalarize(ts_loader.epoch(cfg.seed)), steps_ts)
    else:
        train_fn = lambda: limit(
            tr.batches(bs_tr, shuffle=True, seed=cfg.seed,
                       drop_remainder=True, batch_scalar_cond=bsc), steps_tr)
        test_fn = lambda: limit(
            ts.batches(bs_ts, drop_remainder=True, batch_scalar_cond=bsc),
            steps_ts)

    sample_fn = None
    if args.n_sample_batches:
        sample_fn = lambda: limit(test_fn(), args.n_sample_batches)  # noqa: E731

    if args.device_resident_data:
        if bsc:
            raise SystemExit("--device_resident_data needs per-example "
                             "conditioning (drop --batch_scalar_cond)")
        t0 = time.time()
        n_tr = trainer.stage_dataset(train_fn(), "train")
        n_ts = trainer.stage_dataset(test_fn(), "test",
                                     max_patches=args.staged_test_patches)
        logging.info("staged %d train + %d test patches in HBM (%.1fs, "
                     "input pipeline -> device once; epochs gather on "
                     "device)", n_tr, n_ts, time.time() - t0)
        # staged sampling: the per-epoch sample phase draws its batches
        # from the HBM-staged test set (no H2D), honoring the cap
        trainer.sample_batches_cap = args.n_sample_batches

    trainer.fit(
        train_fn, test_fn,
        cfg.logdir, epochs=cfg.epochs, nll_gauss=nll_gauss, nll_sdn=nll_sdn,
        sc_sd=stats["sc_in_sd"], do_sampling=args.do_sample, verbose=True,
        sample_batches_fn=sample_fn)

    total = time.time() - t_start
    with open(os.path.join(cfg.logdir, "total_time.txt"), "w") as f:
        f.write(f"{total:.1f}\n")  # (ref:train_noise_flow.py:539-540)
    logging.info("done in %.1fs", total)
    return 0


if __name__ == "__main__":
    sys.exit(main())
