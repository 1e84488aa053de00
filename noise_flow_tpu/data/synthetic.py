"""Synthetic SIDD-like fixtures for tests and benchmarks.

The real SIDD_Medium_Raw is ~20 GB of .MAT; tests use a generative stand-in
whose noise actually follows the heteroscedastic camera model
``n ~ N(0, beta1*y + beta2)`` so a trained flow has structure to learn and the
NLF baseline is meaningful.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

# S6 NLF table (ref:train_noise_flow.py:146-148 / cam_iso_nlf.txt)
S6_NLF = {
    100: (0.000479, 0.000002),
    400: (0.001774, 0.000002),
    800: (0.003696, 0.000002),
    1600: (0.008211, 0.000002),
    3200: (0.019930, 0.000002),
}


def make_synthetic_samples(
    n_images: int = 4,
    h: int = 64,
    w: int = 64,
    iso: int = 100,
    cam: float = 2.0,
    seed: int = 0,
    isos: Optional[List[int]] = None,
) -> List[Dict]:
    """Returns image dicts in the schema of data.sidd.load_image_tuple."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_images):
        iso_i = isos[i % len(isos)] if isos else iso
        beta1, beta2 = S6_NLF[iso_i]
        # piecewise-smooth clean image in [0, 1]
        yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                             indexing="ij")
        base = 0.5 + 0.4 * np.sin(2 * np.pi * (xx * (i + 1) + yy))
        clean = np.stack([np.clip(base * s, 0.02, 0.98)
                          for s in (1.0, 0.8, 0.8, 0.6)], axis=-1)
        clean = clean[None].astype(np.float32)
        sd = np.sqrt(beta1 * clean + beta2)
        noise = (rng.standard_normal(clean.shape) * sd).astype(np.float32)
        out.append({
            "noise": noise, "clean": clean,
            "nlf0": beta1, "nlf1": beta2,
            "iso": float(iso_i), "cam": float(cam),
            "fn": f"{i:04d}_001_S6_{iso_i:05d}_synthetic",
        })
    return out
