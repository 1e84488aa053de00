"""Inference-only public API: load a trained model directory and sample noise.

Re-design of ref:borealisflows/NoiseFlowWrapper.py:19-138. The reference
rebuilt a TF1 graph at fixed [None,32,32,4] and restored `model.ckpt.best`;
here we re-hydrate the Config from `hps.txt`, load the best npz checkpoint,
and expose `sample_noise_nf(batch_clean, b1, b2, iso, cam)` — the exact call
signature the DnCNN pipeline and the sampling demo consume
(ref:NoiseFlowWrapper.py:81-87). Sampling is jitted per input shape (cached),
entirely on-device.

Reference quirk preserved: the wrapper samples with `is_training=True` so
coupling-NN batch norm uses batch statistics (ref:NoiseFlowWrapper.py:86) —
controlled by `bn_batch_stats` (default True to match).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from noise_flow_tpu.config import Config, load_hps
from noise_flow_tpu.models.flow import NoiseFlow
from noise_flow_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint


def _best_checkpoint(ckpt_dir: str) -> Optional[str]:
    best = os.path.join(ckpt_dir, "model.ckpt-best.npz")
    if os.path.exists(best):
        return best
    return latest_checkpoint(ckpt_dir)


class NoiseFlowWrapper:
    """Load `path/{hps.txt, ckpt/model.ckpt-best.npz}` and sample noise.

    Example:
        nf = NoiseFlowWrapper("models/NoiseFlow", sampling_temperature=0.6)
        noise = nf.sample_noise_nf(clean_batch, 0.0, 0.0, iso=100, cam=2)
    """

    def __init__(self, path: str, sampling_temperature: float = 0.6,
                 cfg: Optional[Config] = None, bn_batch_stats: bool = True,
                 seed: int = 12345, use_pallas: bool = False):
        self.path = path
        self.temp = float(sampling_temperature)
        self.cfg = cfg or load_hps(os.path.join(path, "hps.txt"))
        self.bn_batch_stats = bn_batch_stats
        ph = self.cfg.patch_height
        self.flow = NoiseFlow((ph, ph, self.cfg.n_channels), self.cfg)
        # init then overwrite from the checkpoint (ref restores .best,
        # NoiseFlowWrapper.py:43,77)
        self.params, self.state = self.flow.init(jax.random.PRNGKey(0))
        ckpt_dir = os.path.join(path, "ckpt")
        ckpt = _best_checkpoint(ckpt_dir)
        if ckpt is not None:
            self.params, self.state, _, self.epoch = load_checkpoint(
                ckpt, self.params, self.state, None)
        else:
            # fall back to the reference's TF checkpoint format — the shipped
            # model directory loads directly (ref:NoiseFlowWrapper.py:43,77)
            from noise_flow_tpu.utils.tf_import import (
                has_tf_checkpoint, import_reference_checkpoint)
            if not has_tf_checkpoint(ckpt_dir):
                raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
            self.params, self.state = import_reference_checkpoint(
                os.path.join(ckpt_dir, "model.ckpt.best"),
                self.flow, self.params, self.state)
            self.epoch = 0
        self._rng = jax.random.PRNGKey(seed)
        self._jitted = {}
        # fused Pallas fast path. bn_batch_stats=True (the reference wrapper's
        # is_training=True quirk, ref:NoiseFlowWrapper.py:86) builds the
        # kernel in bn_mode='batch': BN moments computed in-block, exact
        # parity with the XLA train-BN path when the batch fits one block.
        self._pallas_program = None
        if use_pallas:
            from noise_flow_tpu.ops.pallas_sample import build_sample_program
            self._pallas_program = build_sample_program(
                self.flow, self.params, self.state,
                bn_mode="batch" if bn_batch_stats else "running")

    # ------------------------------------------------------------------ api
    def sample_noise_nf(self, batch_clean: np.ndarray, b1: float, b2: float,
                        iso: float, cam: float,
                        temp: Optional[float] = None) -> np.ndarray:
        """Sample noise for a batch of clean patches
        (ref:NoiseFlowWrapper.py:81-87).

        b1/b2 are the camera NLF betas (only used by condSDN-style layers;
        the published model ignores them — the reference feeds 0.0, 0.0).
        """
        x = np.asarray(batch_clean, np.float32)
        expect = (self.cfg.patch_height, self.cfg.patch_height,
                  self.cfg.n_channels)
        if x.ndim != 4 or x.shape[1:] != expect:
            raise ValueError(
                f"batch_clean must be [B,{expect[0]},{expect[1]},{expect[2]}] "
                f"(model was built at that shape, like the reference's fixed "
                f"placeholders); got {x.shape}")
        b = x.shape[0]
        cond = {
            "clean": jnp.asarray(x),
            "nlf0": jnp.full((b,), float(b1), jnp.float32),
            "nlf1": jnp.full((b,), float(b2), jnp.float32),
            "iso": jnp.full((b,), float(iso), jnp.float32),
            "cam": jnp.full((b,), float(cam), jnp.float32),
        }
        t = self.temp if temp is None else float(temp)
        self._rng, k = jax.random.split(self._rng)
        if self._pallas_program is not None:
            from noise_flow_tpu.ops.pallas_sample import pallas_sample
            bt = 64
            if self.bn_batch_stats:
                # batch-stats BN: one block per batch where VMEM allows, so
                # the in-kernel moments are the full batch's (exact quirk
                # parity); larger batches fall back to ghost blocks
                bt = b if b <= 256 else next(
                    d for d in range(256, 0, -1) if b % d == 0)
            return np.asarray(pallas_sample(self._pallas_program, k, cond,
                                            temp=t, bt=bt))
        fn = self._get_jitted(x.shape, t)
        return np.asarray(fn(self.params, self.state, k, cond))

    def sample_noise_frame(self, clean_frame: np.ndarray, b1: float,
                           b2: float, iso: float, cam: float,
                           temp: Optional[float] = None,
                           batch: int = 4096) -> np.ndarray:
        """Sample noise for a FULL packed raw frame [H, W, 4] (or [1, H, W, 4]).

        The flow is patch-based (32x32 receptive field); the frame is tiled
        into patch-grid tiles, sampled in large device batches (the Pallas
        fast path when enabled), and stitched back. The reference offered
        only manual patch crops (ref:sample_noise_flow.py:62-76); this makes
        whole-frame synthesis one call. Edges are covered by padding the
        frame up to a patch multiple and cropping the result.
        """
        x = np.asarray(clean_frame, np.float32)
        if x.ndim == 4:
            x = x[0]
        h, w, c = x.shape
        ph = self.cfg.patch_height
        pad_h = (-h) % ph
        pad_w = (-w) % ph
        xp = np.pad(x, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        hh, ww = xp.shape[:2]
        # frame -> [n_tiles, ph, ph, 4]
        tiles = xp.reshape(hh // ph, ph, ww // ph, ph, c)
        tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(-1, ph, ph, c)
        outs = []
        for s in range(0, len(tiles), batch):
            outs.append(self.sample_noise_nf(tiles[s:s + batch], b1, b2,
                                             iso, cam, temp))
        noise_tiles = np.concatenate(outs)
        noise = noise_tiles.reshape(hh // ph, ww // ph, ph, ph, c)
        noise = noise.transpose(0, 2, 1, 3, 4).reshape(hh, ww, c)
        return noise[:h, :w]

    def sample_noise_frame_spatial(self, clean_frame: np.ndarray, b1: float,
                                   b2: float, iso: float, cam: float,
                                   temp: Optional[float] = None,
                                   mesh=None) -> np.ndarray:
        """Sample noise for a FULL frame with the flow run AT frame size,
        spatially sharded over the device mesh (SURVEY.md §2.6 optional row).

        The flow is fully convolutional, so the published 32x32-trained
        weights apply at any (H, W): the frame's height is sharded across
        the 'data' mesh axis and XLA partitions the 3x3 coupling convs with
        the required halo exchanges over ICI — no manual ppermute. Unlike
        ``sample_noise_frame`` (independent 32x32 tiles), this produces
        noise with no tile seams: the coupling receptive field crosses the
        whole frame.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from noise_flow_tpu.parallel.mesh import make_mesh

        x = np.asarray(clean_frame, np.float32)
        if x.ndim == 3:
            x = x[None]
        mesh = mesh or make_mesh()
        n_dev = mesh.size
        h, w = x.shape[1], x.shape[2]
        pad_h = (-h) % (8 * n_dev)  # sublane-amenable equal shards
        pad_w = (-w) % 8
        xp = np.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="reflect")
        frame_shape = xp.shape[1:]
        flow = NoiseFlow(frame_shape, self.cfg)
        sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
        b = 1
        cond = {
            "clean": jax.device_put(jnp.asarray(xp), sh),
            "nlf0": jnp.full((b,), float(b1), jnp.float32),
            "nlf1": jnp.full((b,), float(b2), jnp.float32),
            "iso": jnp.full((b,), float(iso), jnp.float32),
            "cam": jnp.full((b,), float(cam), jnp.float32),
        }
        t = self.temp if temp is None else float(temp)
        self._rng, k = jax.random.split(self._rng)
        train = self.bn_batch_stats

        @jax.jit
        def fn(params, state, rng, cond):
            return flow.sample(params, state, rng, cond, temp=t, batch=b,
                               train=train)

        out = np.asarray(fn(self.params, self.state, k, cond))[0]
        return out[:h, :w]

    # ------------------------------------------------------------ internals
    _JIT_CACHE_MAX = 8

    def _get_jitted(self, shape: Tuple[int, ...], temp: float):
        key = (shape, temp)
        if key not in self._jitted:
            if len(self._jitted) >= 1:
                import logging
                logging.getLogger(__name__).warning(
                    "sample_noise_nf: new (shape, temp) %s triggers a fresh "
                    "compile (%d cached); batch callers should keep a fixed "
                    "batch size", key, len(self._jitted))
            if len(self._jitted) >= self._JIT_CACHE_MAX:
                # FIFO eviction: a shape/temp sweep must not accumulate
                # compiled programs without bound
                self._jitted.pop(next(iter(self._jitted)))
            flow, train = self.flow, self.bn_batch_stats

            @jax.jit
            def fn(params, state, rng, cond):
                return flow.sample(params, state, rng, cond, temp=temp,
                                   batch=shape[0], train=train)

            self._jitted[key] = fn
        return self._jitted[key]
