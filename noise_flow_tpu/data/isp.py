"""Minimal ISP: render packed SIDD raw patches to sRGB for visual inspection.

Re-design of ref:sidd/pipeline.py:9-74 and ref:sidd/raw_utils.py:6-185.
Host-side numpy/cv2 (diagnostics only — never on the TPU hot path). The
pipeline: Bayer flip to RGGB -> white-balance gains -> demosaic -> camera CCM
(cst2 . rgb2xyz)^-1 row-normalized -> gamma 1/2.2 -> uint8 BGR.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# sRGB D65 (ref:sidd/pipeline.py:16-22)
RGB2XYZ = np.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
])

_CAM_MAKE_IDS = {"Apple": 0, "Google": 1, "samsung": 2, "motorola": 3, "LGE": 4}


def read_metadata(meta_path: str):
    """-> (meta, bayer_2by2, wb, cst2, iso, cam) (ref:raw_utils.py:6-24)."""
    from scipy.io import loadmat

    meta = loadmat(meta_path)["metadata"][0, 0]
    bayer = _bayer_pattern(meta)
    bayer_2by2 = (np.asarray(bayer) + 1).reshape((2, 2)).tolist()
    wb = meta["AsShotNeutral"]
    cst2 = meta["ColorMatrix2"].reshape((3, 3))
    iso = _get_iso(meta)
    cam = _CAM_MAKE_IDS[meta["Make"][0]]
    return meta, bayer_2by2, wb, cst2, iso, cam


def _get_iso(meta) -> float:
    for getter in (lambda m: m["ISOSpeedRatings"][0][0],
                   lambda m: m["DigitalCamera"][0, 0]["ISOSpeedRatings"][0][0]):
        try:
            return float(getter(meta))
        except Exception:
            continue
    raise KeyError("ISO not found in metadata")


def _bayer_pattern(meta):
    """CFA pattern from TIFF tag 33422 (ref:raw_utils.py:44-71)."""
    candidates = (
        lambda m: m["UnknownTags"],
        lambda m: m["SubIFDs"][0, 0]["UnknownTags"][0, 0],
        lambda m: m["SubIFDs"][0, 1]["UnknownTags"],
    )
    for get in candidates:
        try:
            tags = get(meta)
            if tags[1]["ID"][0][0][0] == 33422:
                return tags[1]["Value"][0][0]
        except Exception:
            continue
    return [1, 2, 2, 3]  # assume RGGB


def flip_bayer(image: np.ndarray, bayer_2by2) -> np.ndarray:
    """Reorient any 2x2 CFA to RGGB by mirror flips (ref:raw_utils.py:99-114)."""
    if bayer_2by2 == [[1, 2], [2, 3]]:
        return image
    if bayer_2by2 == [[2, 1], [3, 2]]:
        return np.fliplr(image)
    if bayer_2by2 == [[2, 3], [1, 2]]:
        return np.flipud(image)
    if bayer_2by2 == [[3, 2], [2, 1]]:
        return np.flipud(np.fliplr(image))
    raise ValueError(f"unknown Bayer pattern {bayer_2by2!r}")


def stack_rggb(bayer: np.ndarray) -> np.ndarray:
    """Bayer (h,w) -> (h/2, w/2, 4) RGGB planes (ref:raw_utils.py:130-139).

    NOTE channel order differs from data.sidd.pack_raw: here G2 is at [1::2,0::2]
    position index 2 (row-major), matching the render path's RGGB2Bayer."""
    return np.stack((bayer[0::2, 0::2], bayer[0::2, 1::2],
                     bayer[1::2, 0::2], bayer[1::2, 1::2]), axis=2)


def rggb_to_bayer(rggb: np.ndarray) -> np.ndarray:
    """(h/2, w/2, 4) row-major RGGB -> Bayer (h,w) (ref:raw_utils.py:81-89)."""
    h, w, _ = rggb.shape
    bayer = np.zeros((h * 2, w * 2), rggb.dtype)
    bayer[0::2, 0::2] = rggb[:, :, 0]
    bayer[0::2, 1::2] = rggb[:, :, 1]
    bayer[1::2, 0::2] = rggb[:, :, 2]
    bayer[1::2, 1::2] = rggb[:, :, 3]
    return bayer


def demosaic(rggb: np.ndarray) -> np.ndarray:
    """Demosaic a row-major RGGB stack to RGB in [0,1].

    Uses cv2 edge-aware demosaicing when available (ref:raw_utils.py:91-97),
    else a bilinear numpy fallback.
    """
    bayer = rggb_to_bayer(rggb)
    try:
        import cv2
        dem = cv2.cvtColor(
            np.clip(bayer * 16383, 0, 16383).astype(np.uint16),
            cv2.COLOR_BayerBG2RGB_EA)
        return dem.astype(np.float32) / 16383.0
    except ImportError:
        return _demosaic_bilinear(bayer)


def _demosaic_bilinear(bayer: np.ndarray) -> np.ndarray:
    """Convolutional bilinear demosaic (RGGB CFA)."""
    h, w = bayer.shape
    r = np.zeros((h, w), np.float32)
    g = np.zeros((h, w), np.float32)
    b = np.zeros((h, w), np.float32)
    r[0::2, 0::2] = bayer[0::2, 0::2]
    g[0::2, 1::2] = bayer[0::2, 1::2]
    g[1::2, 0::2] = bayer[1::2, 0::2]
    b[1::2, 1::2] = bayer[1::2, 1::2]

    def interp(plane, kernel):
        from scipy.ndimage import convolve
        weight = convolve((plane != 0).astype(np.float32), kernel, mode="mirror")
        val = convolve(plane, kernel, mode="mirror")
        return val / np.maximum(weight, 1e-8)

    k_rb = np.array([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]],
                    np.float32)
    k_g = np.array([[0.0, 0.25, 0.0], [0.25, 1.0, 0.25], [0.0, 0.25, 0.0]],
                   np.float32)
    return np.clip(np.stack([interp(r, k_rb), interp(g, k_g), interp(b, k_rb)],
                            axis=2), 0.0, 1.0)


def apply_wb_gains(bayer: np.ndarray, wb) -> np.ndarray:
    """Per-CFA-site white balance on the RGGB stack (ref:pipeline.py:44-47)."""
    wb = np.asarray(wb, np.float64).reshape(-1)
    gains = np.array([1.0 / wb[0], 1.0 / wb[1], 1.0 / wb[1], 1.0 / wb[2]],
                     np.float32)
    return bayer * gains[None, None, :]


def apply_ccm(rgb: np.ndarray, ccm: np.ndarray) -> np.ndarray:
    """Per-pixel 3x3 color transform (ref:pipeline.py:57-60)."""
    return np.einsum("hwc,oc->hwo", rgb, ccm)


def gamma_compress(rgb: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    return np.maximum(rgb, 1e-8) ** (1.0 / gamma)


def process_sidd_image(bayer_image: np.ndarray, bayer_2by2, wb, cst2,
                       *, to_bgr: bool = True) -> np.ndarray:
    """Full render: Bayer (h,w) in [0,1] -> uint8 sRGB (BGR for cv2.imwrite)
    (ref:pipeline.py:9-41)."""
    bayer = flip_bayer(np.asarray(bayer_image, np.float32), bayer_2by2)
    rggb = stack_rggb(bayer)
    rggb = np.clip(apply_wb_gains(rggb, wb), 0.0, 1.0)
    rgb = demosaic(rggb)

    rgb2cam = np.matmul(cst2, RGB2XYZ)
    cam2rgb = np.linalg.inv(rgb2cam)
    cam2rgb = cam2rgb / np.sum(cam2rgb, axis=-1, keepdims=True)
    srgb = np.clip(apply_ccm(rgb, cam2rgb), 0.0, 1.0)
    srgb = gamma_compress(srgb)

    out = (srgb * 255.0).astype(np.uint8)
    if to_bgr:
        out = out[..., ::-1]
    return out
