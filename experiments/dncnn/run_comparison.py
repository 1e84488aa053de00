"""DnCNN downstream comparison — the paper's 4-source ordering (VERDICT r3
item 4).

Reproduces the reference's headline downstream experiment
(ref:train_dncnn_noiseflow.py:176-240, ref:test_dncnn_noiseflow.py:204-215)
on the synthetic-at-scale SIDD proxy (experiments/sidd/make_sidd_scale.py):
train one DnCNN denoiser per noise source —

  gauss   blind Gaussian, sigma ~ U[0.24, 11.5]/255 (ref:33-36)
  camnlf  per-(cam, ISO) heteroscedastic NLF from cam_iso_nlf.txt
  nf      a converged NoiseFlow sampler fused into the train step
          (50% Gaussian-sigma augmentation, ref:150-163)
  real    the dataset's real noisy/clean pairs

— then score PSNR/SSIM on validation blocks built from the TEST-split
scenes in the REAL SIDD validation format (ValidationNoisyBlocksRaw.mat /
ValidationGtBlocksRaw.mat, [40, n_blk, 256, 256] Bayer, evaluated through
the production cli.test_dncnn machinery including its ISO-exclusion list).
Training uses TRAIN-split instances only — no scene overlap with the
validation blocks.

The paper's core downstream claim to reproduce: DnCNN-NF beats DnCNN-Gauss.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def build_validation_blocks(data_root: str, out_dir: str, n_im: int = 40,
                            n_blk: int = 8, size: int = 256) -> tuple:
    """TEST-split scenes -> real-format validation block .mat files.

    [n_im, n_blk, 256, 256] Bayer like the SIDD Validation set
    (ref:test_dncnn_noiseflow.py:49-82); cli.test_dncnn's
    load_validation_blocks then applies its 20-image ISO exclusion on top,
    exactly as in production."""
    from scipy.io import savemat

    from noise_flow_tpu.data.sidd import (
        TEST_INSTANCE_IDS, load_image_tuple, sidd_filename_tuples, unpack_raw)

    noisy_p = os.path.join(out_dir, "ValidationNoisyBlocksRaw.mat")
    gt_p = os.path.join(out_dir, "ValidationGtBlocksRaw.mat")
    if os.path.exists(noisy_p) and os.path.exists(gt_p):
        return noisy_p, gt_p
    tuples, _ = sidd_filename_tuples(data_root, "test", 10, 12)
    assert len(tuples) >= n_im, f"need {n_im} test images, got {len(tuples)}"
    rng = np.random.default_rng(11)
    noisy_blocks = np.zeros((n_im, n_blk, size, size), np.float32)
    gt_blocks = np.zeros((n_im, n_blk, size, size), np.float32)
    for i in range(n_im):
        d = load_image_tuple(tuples[i])
        clean_b = unpack_raw(d["clean"][0])     # full Bayer frame
        noisy_b = unpack_raw((d["clean"] + d["noise"])[0])
        h, w = clean_b.shape
        for b in range(n_blk):
            # even offsets keep Bayer phase (blocks must start on an R site)
            y = 2 * int(rng.integers(0, (h - size) // 2))
            x = 2 * int(rng.integers(0, (w - size) // 2))
            gt_blocks[i, b] = clean_b[y:y + size, x:x + size]
            noisy_blocks[i, b] = noisy_b[y:y + size, x:x + size]
    os.makedirs(out_dir, exist_ok=True)
    savemat(noisy_p, {"ValidationNoisyBlocksRaw": noisy_blocks})
    savemat(gt_p, {"ValidationGtBlocksRaw": gt_blocks})
    return noisy_p, gt_p


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--data_root",
                   default=os.path.join(REPO, "data",
                                        "SIDD_Medium_Raw_synth", "Data"))
    p.add_argument("--flow_dir",
                   default=os.path.join(REPO, "experiments", "sidd",
                                        "prod_synth_scale"))
    p.add_argument("--val_dir",
                   default=os.path.join(REPO, "data", "sidd_valblocks"))
    p.add_argument("--out", default=os.path.join(REPO, "experiments",
                                                 "dncnn", "comparison"))
    p.add_argument("--epochs", type=int, default=45)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--sources", default="gauss,camnlf,nf,real")
    a = p.parse_args(argv)

    from noise_flow_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from noise_flow_tpu.cli.test_dncnn import (
        evaluate_model, load_validation_blocks)
    from noise_flow_tpu.data.dncnn_data import load_dncnn_data
    from noise_flow_tpu.data.sidd import (
        CAM_IDS, TRAIN_INSTANCE_IDS, load_cam_iso_nlf)
    from noise_flow_tpu.training.dncnn_trainer import DnCNNTrainer
    from noise_flow_tpu.utils.image_metrics import (
        mean_psnr_blocks, mean_ssim_blocks)
    from noise_flow_tpu.wrapper import NoiseFlowWrapper

    os.makedirs(a.out, exist_ok=True)
    build_validation_blocks(a.data_root, a.val_dir)
    noisy_mat, ref_mat = load_validation_blocks(a.val_dir)
    print(f"validation blocks: {noisy_mat.shape} (after ISO exclusion)",
          flush=True)
    base_psnr, _ = mean_psnr_blocks(ref_mat, noisy_mat)
    base_ssim = mean_ssim_blocks(ref_mat, noisy_mat)

    table = load_cam_iso_nlf(os.path.join(REPO, "cam_iso_nlf.txt"))
    rows = [(CAM_IDS.index(k.split("_")[0]), float(int(k.split("_")[1])),
             b1, b2) for k, (b1, b2) in sorted(table.items())]

    print("loading DnCNN training patches (train instances only)...",
          flush=True)
    clean, info, noisy = load_dncnn_data(
        a.data_root, cam_iso_nlf_path=os.path.join(REPO, "cam_iso_nlf.txt"),
        with_noisy=True, batch_size=a.batch, max_images=a.max_images,
        instance_ids=TRAIN_INSTANCE_IDS)
    print(f"train patches: {clean.shape}", flush=True)

    nf_tuple = None
    if "nf" in a.sources.split(","):
        nf = NoiseFlowWrapper(a.flow_dir, sampling_temperature=1.0)
        nf_tuple = (nf.flow, nf.params, nf.state)

    results = {}
    for src in a.sources.split(","):
        t0 = time.time()
        save_dir = os.path.join(a.out, f"DnCNN_{src}")
        tr = DnCNNTrainer(noise_source=src, cam_iso_rows=rows,
                          noise_flow=nf_tuple if src == "nf" else None,
                          lr=1e-3)
        tr.fit(clean, save_dir, epochs=a.epochs, batch_size=a.batch,
               noisy=noisy if src == "real" else None,
               save_every=a.epochs, verbose=False)
        psnr, psnrs, ssim, _ = evaluate_model(tr, noisy_mat, ref_mat)
        results[src] = {"psnr": float(psnr), "ssim": float(ssim),
                        "train_s": round(time.time() - t0, 1)}
        print(f"{src}: PSNR={psnr:.2f} dB SSIM={ssim:.4f} "
              f"({results[src]['train_s']}s)", flush=True)

    results["noisy_input"] = {"psnr": float(base_psnr),
                              "ssim": float(base_ssim)}
    with open(os.path.join(a.out, "results.json"), "w") as f:
        json.dump({"epochs": a.epochs, "batch": a.batch,
                   "n_train_patches": int(len(clean)),
                   "val_blocks": list(noisy_mat.shape),
                   "results": results}, f, indent=1)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
