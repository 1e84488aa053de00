"""Standalone sampling demo CLI.

Re-design of ref:sample_noise_flow.py:27-101: load a trained model directory
via NoiseFlowWrapper (temp 0.6), sample noise for random crops, render
clean / real-noisy / synthetic-noisy sRGB triptychs, save .png/.mat, and
report the mean forward marginal KLD vs real noise.

Works against real SIDD scenes (--sidd_path) or synthetic fixtures
(--synthetic), in which case the ISP render uses a neutral metadata set.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys
from typing import List, Optional

import numpy as np

from noise_flow_tpu.data.isp import process_sidd_image, read_metadata
from noise_flow_tpu.data.sidd import pack_raw, unpack_raw
from noise_flow_tpu.data.synthetic import make_synthetic_samples
from noise_flow_tpu.utils.metrics import kl_div_3_data
from noise_flow_tpu.wrapper import NoiseFlowWrapper

# neutral render metadata for synthetic mode: RGGB, unit WB, identity-ish CST
_RGGB = [[1, 2], [2, 3]]
_UNIT_WB = np.array([[1.0, 1.0, 1.0]])
_ID_CST = np.linalg.inv(np.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
]))


def _save_png(path: str, img: np.ndarray, scale: int = 8) -> None:
    try:
        import cv2
        h, w = img.shape[:2]
        img = cv2.resize(img, (w * scale, h * scale),
                         interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image
        Image.fromarray(img[..., ::-1]).resize(
            (img.shape[1] * scale, img.shape[0] * scale)).save(path)


def _iter_scenes(args):
    """Yield (clean[1,H,W,4], noisy[1,H,W,4], bayer2x2, wb, cst2, iso, cam)."""
    if args.synthetic:
        for s in make_synthetic_samples(n_images=3, h=256, w=256,
                                        isos=[100, 800, 1600], seed=3):
            yield (s["clean"], s["clean"] + s["noise"], _RGGB, _UNIT_WB,
                   _ID_CST, int(s["iso"]), int(s["cam"]), None)
        return
    from noise_flow_tpu.data.sidd import _read_mat_array
    for sc_id in args.scene_ids:
        pat = os.path.join(args.sidd_path, "%04d_*" % sc_id)
        noisy_fns = glob.glob(os.path.join(pat, "*NOISY_RAW_010.MAT"))
        if not noisy_fns:
            logging.warning("scene %04d not found under %s", sc_id,
                            args.sidd_path)
            continue
        noisy = pack_raw(_read_mat_array(noisy_fns[0]))[None].astype(np.float32)
        clean = pack_raw(_read_mat_array(
            glob.glob(os.path.join(pat, "*GT_RAW_010.MAT"))[0]))[None].astype(np.float32)
        meta, bayer, wb, cst2, iso, cam = read_metadata(
            glob.glob(os.path.join(pat, "*METADATA_RAW_010.MAT"))[0])
        if iso not in (100, 400, 800, 1600, 3200):
            continue  # (ref:sample_noise_flow.py:55-56)
        yield clean, noisy, bayer, wb, cst2, iso, cam, meta


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser("sample_noise_flow")
    p.add_argument("--model_path", type=str, required=True,
                   help="dir with hps.txt + ckpt/ (NoiseFlowWrapper layout)")
    p.add_argument("--sidd_path", type=str,
                   default="./data/SIDD_Medium_Raw/Data")
    p.add_argument("--out_dir", type=str, default="./samples")
    p.add_argument("--temp", type=float, default=0.6)
    p.add_argument("--n_pat", type=int, default=10)
    p.add_argument("--scene_ids", type=int, nargs="+", default=[10, 52, 64])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--seed", type=int, default=12345)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from noise_flow_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    nf = NoiseFlowWrapper(args.model_path, sampling_temperature=args.temp)
    ph = nf.cfg.patch_height
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    kldiv_list = []

    for clean, noisy, bayer, wb, cst2, iso, cam, meta in _iter_scenes(args):
        for pi in range(args.n_pat):
            v = int(rng.integers(0, clean.shape[1] - ph))
            u = int(rng.integers(0, clean.shape[2] - ph))
            clean_p = clean[:, v:v + ph, u:u + ph, :]
            noisy_p = noisy[0, v:v + ph, u:u + ph, :]

            noise_syn = nf.sample_noise_nf(clean_p, 0.0, 0.0, iso, cam)

            # trim the 1px border like the reference (edge effects of the
            # 3x3 coupling convs, ref:sample_noise_flow.py:72-76)
            syn = np.squeeze(noise_syn)[1:-1, 1:-1, :]
            cln = np.squeeze(clean_p)[1:-1, 1:-1, :]
            nsy = noisy_p[1:-1, 1:-1, :]

            ims = []
            for raw4 in (cln, nsy, np.clip(cln + syn, 0.0, 1.0)):
                ims.append(process_sidd_image(unpack_raw(raw4), bayer, wb, cst2))
            trip = np.concatenate(ims, axis=1)
            _save_png(os.path.join(
                args.out_dir, f"{len(kldiv_list):03d}_{iso:04d}.png"), trip)

            from scipy.io import savemat
            savemat(os.path.join(
                args.out_dir, f"{len(kldiv_list):03d}_{iso:04d}.mat"),
                {"clean": cln, "noisy": nsy, "noisy_syn":
                 np.clip(cln + syn, 0.0, 1.0)})

            kld_fwd, _, _ = kl_div_3_data((nsy - cln).flatten(), syn.flatten())
            kldiv_list.append(kld_fwd)

    mean_kld = float(np.mean(kldiv_list)) if kldiv_list else float("nan")
    print(f"Mean KL divergence = {mean_kld}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
