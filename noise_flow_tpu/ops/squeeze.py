"""Space-to-depth squeeze for multi-scale flows (ref:borealisflows/utils.py:30-86).

Pure reshapes/transposes — free on TPU (layout changes fused by XLA).
"""

from __future__ import annotations

import jax.numpy as jnp


def squeeze2d(x, factor: int = 2, squeeze_type: str = "chessboard"):
    if factor == 1:
        return x
    b, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0
    if squeeze_type == "patch":
        x = x.reshape(b, factor, h // factor, factor, w // factor, c)
        x = x.transpose(0, 2, 4, 5, 1, 3)
    else:  # chessboard (default; unknown types fall back, ref:utils.py:52-57)
        x = x.reshape(b, h // factor, factor, w // factor, factor, c)
        x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def unsqueeze2d(x, factor: int = 2, squeeze_type: str = "chessboard"):
    if factor == 1:
        return x
    b, h, w, c = x.shape
    assert c >= 4 and c % (factor * factor) == 0
    x = x.reshape(b, h, w, c // factor ** 2, factor, factor)
    if squeeze_type == "patch":
        x = x.transpose(0, 4, 1, 5, 2, 3)
    else:
        x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * factor, w * factor, c // factor ** 2)
