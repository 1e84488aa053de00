"""SIDD raw I/O: .MAT reading, Bayer packing, metadata parsing, dataset splits.

Host-side re-design of ref:sidd/sidd_utils.py:224-283 (image tuples),
732-764 (pack/unpack), 884-929 (scene-instance splits), 718-729 (metadata NLF).
Heavy lifting is numpy; the training hot path never touches this module — it
reads the preprocessed cache (see noise_flow_tpu.data.cache) instead.
"""

from __future__ import annotations

import glob
import os
from os import path
from typing import Dict, List, Optional, Tuple

import numpy as np

CAM_IDS = ["IP", "GP", "S6", "N6", "G4"]

# Hardcoded SIDD scene-instance splits (ref:sidd/sidd_utils.py:888-894).
TRAIN_INSTANCE_IDS = [
    4, 11, 13, 17, 18, 20, 22, 23, 25, 27, 28, 29, 30, 34, 35, 39, 40, 42, 43,
    44, 45, 47, 81, 86, 88, 90, 101, 102, 104, 105, 110, 111, 115, 116, 125,
    126, 127, 129, 132, 135, 138, 140, 175, 177, 178, 179, 180, 181, 185, 186,
    189, 192, 193, 194, 196, 197,
]
TEST_INSTANCE_IDS = [
    54, 55, 57, 59, 60, 62, 63, 66, 150, 151, 152, 154, 155, 159, 160, 161,
    163, 164, 165, 166, 198, 199,
]


def pack_raw(raw_im: np.ndarray) -> np.ndarray:
    """Bayer (h, w) -> packed RGGB (h/2, w/2, 4) (ref:sidd_utils.py:732-748)."""
    im = np.asarray(raw_im)
    return np.stack(
        (im[0::2, 0::2], im[0::2, 1::2], im[1::2, 1::2], im[1::2, 0::2]),
        axis=2,
    )


def unpack_raw(raw4ch: np.ndarray) -> np.ndarray:
    """Packed (h/2, w/2, 4) -> Bayer (h, w) (ref:sidd_utils.py:751-764)."""
    h, w, _ = raw4ch.shape
    bayer = np.zeros((h * 2, w * 2), dtype=np.float32)
    bayer[0::2, 0::2] = raw4ch[:, :, 0]
    bayer[0::2, 1::2] = raw4ch[:, :, 1]
    bayer[1::2, 1::2] = raw4ch[:, :, 2]
    bayer[1::2, 0::2] = raw4ch[:, :, 3]
    return bayer


def parse_scene_dirname(sdir: str) -> Tuple[float, float]:
    """'NNNN_SSS_CC_IIIII_...' -> (iso, cam_index) (ref:sidd_utils.py:255-262)."""
    iso = float(sdir[12:17])
    cam = float(CAM_IDS.index(sdir[9:11]))
    return iso, cam


def _read_mat_array(fp: str) -> np.ndarray:
    """Read the single array from a .MAT file (v7.3 HDF5 or legacy)."""
    try:
        import h5py
        with h5py.File(fp, "r") as f:
            return np.asarray(f[list(f.keys())[0]])
    except (OSError, ImportError):
        from scipy.io import loadmat
        d = loadmat(fp)
        keys = [k for k in d.keys() if not k.startswith("__")]
        return np.asarray(d[keys[0]])


def load_metadata_nlf(meta_path: str) -> Tuple[float, float]:
    """Extract (nlf0, nlf1) from SIDD metadata (ref:sidd_utils.py:718-729),
    floored at 1e-6 (ref:sidd_utils.py:269-271)."""
    from scipy.io import loadmat
    meta = loadmat(meta_path)["metadata"][0, 0]
    nlf = meta["UnknownTags"][7, 0][2][0][0:2]
    nlf0 = float(nlf[0])
    nlf1 = float(nlf[1])
    nlf0 = 1e-6 if nlf0 <= 0 else nlf0
    nlf1 = 1e-6 if nlf1 <= 0 else nlf1
    return nlf0, nlf1


def load_image_tuple(filepath_tuple) -> Dict:
    """(noisy, gt, var, meta) paths -> sample dict with noise = noisy - clean
    (ref:sidd_utils.py:224-283)."""
    in_path, gt_path, _var_path, meta_path = filepath_tuple

    noisy = pack_raw(_read_mat_array(in_path))[None].astype(np.float32)
    noisy = np.clip(np.nan_to_num(noisy), 0.0, 1.0)
    gt = pack_raw(_read_mat_array(gt_path))[None].astype(np.float32)
    gt = np.clip(np.nan_to_num(gt), 0.0, 1.0)

    if meta_path and os.path.exists(meta_path):
        nlf0, nlf1 = load_metadata_nlf(meta_path)
    else:
        nlf0 = nlf1 = 1e-6

    fparts = in_path.split("/")
    sdir = fparts[-3]
    if len(sdir) != 30:
        sdir = fparts[-2]
    iso, cam = parse_scene_dirname(sdir)

    noise = noisy - gt  # the crucial step (ref:sidd_utils.py:264-265)
    return {
        "noise": noise, "clean": gt, "nlf0": nlf0, "nlf1": nlf1,
        "iso": iso, "cam": cam, "fn": sdir,
    }


def sidd_filename_tuples(
    sidd_path: str,
    train_or_test: str = "train",
    first_im_idx: int = 0,
    last_im_idx: int = 1,
    cam: Optional[str] = None,
    iso: Optional[int] = None,
    max_instances: Optional[int] = None,
) -> Tuple[List[Tuple[str, str, str, str]], int]:
    """Enumerate (NOISY, GT, VARIANCE, METADATA) .MAT tuples for the split
    (ref:sidd_utils.py:884-929). Returns (tuples, n_instances).

    max_instances caps the enumerated scene instances (quick-run aid; the
    reference's hps.n_tr_inst was informational — overwritten from the
    enumeration, ref:sidd/Initialization.py:31-33)."""
    inst_idxs = TRAIN_INSTANCE_IDS if train_or_test == "train" else TEST_INSTANCE_IDS
    fns: List[Tuple[str, str, str, str]] = []
    cnt_inst = 0
    for idx in inst_idxs:
        if max_instances is not None and cnt_inst >= max_instances:
            break
        id_str = "%04d" % idx
        matches = glob.glob(path.join(sidd_path, id_str + "*"))
        if not matches:
            continue
        subdir = path.split(matches[0])[-1]
        if cam is not None and subdir[9:11] != cam:
            continue
        if iso is not None and iso != 0 and int(subdir[12:17]) != iso:
            continue
        for i in range(first_im_idx, last_im_idx):
            if "SIDD_Medium" in sidd_path:
                fns.append((
                    path.join(sidd_path, subdir, f"{id_str}_NOISY_RAW_{i:03d}.MAT"),
                    path.join(sidd_path, subdir, f"{id_str}_GT_RAW_{i:03d}.MAT"),
                    path.join(sidd_path, subdir, f"{id_str}_VARIANCE_RAW_{i:03d}.MAT"),
                    path.join(sidd_path, subdir, f"{id_str}_METADATA_RAW_{i:03d}.MAT"),
                ))
            else:
                fns.append((
                    path.join(sidd_path, subdir, f"{id_str}_NOISY_RAW",
                              f"{id_str}_NOISY_RAW_{i:03d}.MAT"),
                    path.join(sidd_path, subdir, f"{id_str}_GT_RAW",
                              f"{id_str}_GT_RAW_{i:03d}.MAT"),
                    path.join(sidd_path, subdir, f"{id_str}_VARIANCE_RAW",
                              f"{id_str}_VARIANCE_RAW_{i:03d}.MAT"),
                    path.join(sidd_path, subdir, f"{id_str}_METADATA_RAW",
                              f"{id_str}_METADATA_RAW_{i:03d}.MAT"),
                ))
        cnt_inst += 1
    return fns, cnt_inst


def load_cam_iso_nlf(path_txt: str) -> Dict[str, Tuple[float, float]]:
    """Parse cam_iso_nlf.txt csv: header 'cam_iso,beta1,beta2' then
    'S6_00100,0.000479,0.000002' rows (ref:cam_iso_nlf.txt:1-16)."""
    table = {}
    with open(path_txt) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) >= 3 and parts[0] != "cam_iso":
                table[parts[0]] = (float(parts[1]), float(parts[2]))
    return table
