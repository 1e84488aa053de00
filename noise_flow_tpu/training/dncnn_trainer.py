"""DnCNN training: noise synthesis fused on-device into the jitted train step.

Re-design of ref:train_dncnn_noiseflow.py:127-300. The reference ran 32
Python threads sampling noise through a second TF graph and fed batches to a
Keras fit_generator; here each train step is ONE jitted XLA program that
draws the noise (Gaussian / SDN / camera-NLF / NoiseFlow) on-device from the
clean batch and immediately takes the gradient step — no host round trip, no
thread pool. The NoiseFlow generator runs with frozen flow params inside the
same program (replacing ref:train_dncnn_noiseflow.py:191-198).

Loss: sum-squared-error / 2 (ref:train_dncnn_noiseflow.py:244-245).
LR schedule: lr for epochs<=30, lr/10 <=60, lr/20 after
(ref:train_dncnn_noiseflow.py:127-138).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from noise_flow_tpu.config import CAM_NAMES
from noise_flow_tpu.models.dncnn import dncnn_apply, dncnn_init
from noise_flow_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from noise_flow_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from noise_flow_tpu.utils.image_metrics import psnr as psnr_metric

def _stage_key(a: Optional[np.ndarray]):
    """Cheap identity for a host array staged to HBM: shape + dtype + a hash
    of <=64k elements strided uniformly across the WHOLE flat buffer — so a
    different array reusing a GC'd id() and any in-place edit touching at
    least ~1/65536 of the data both restage, without hashing gigabytes."""
    if a is None:
        return None
    a = np.asarray(a)
    flat = a.reshape(-1)
    sample = np.ascontiguousarray(flat[::max(1, flat.size // 65536)])
    return (a.shape, str(a.dtype), hash(sample.tobytes()))


# Gaussian sigma (in [0,255]) and camera NLF ranges estimated from SIDD
# (ref:train_dncnn_noiseflow.py:33-36)
MIN_EST_SIGMA = 0.24186
MAX_EST_SIGMA = 11.507
MIN_CAM_NLF = (0.00011841, 2.0024e-06)
MAX_CAM_NLF = (0.021949, 0.0017506)


def lr_schedule(epoch: int, initial_lr: float) -> float:
    """(ref:train_dncnn_noiseflow.py:127-138)"""
    if epoch <= 30:
        return initial_lr
    if epoch <= 60:
        return initial_lr / 10.0
    return initial_lr / 20.0


class DnCNNTrainer:
    """noise_source: 'gauss' | 'sdn' | 'camnlf' | 'nf' | 'real'.

    For 'nf', pass `noise_flow=(flow, params, state)` (e.g. from
    NoiseFlowWrapper: `(nf.flow, nf.params, nf.state)`); sampling runs
    on-device inside the train step with a random cam_iso per batch and a
    50/50 Gaussian-sigma augmentation, like the reference generator
    (ref:train_dncnn_noiseflow.py:150-163).
    For 'camnlf'/'nf', pass `cam_iso_rows=[(cam_idx, iso, b1, b2), ...]`
    (from cam_iso_nlf.txt).
    """

    def __init__(self, cfg=None, depth: int = 9, filters: int = 32,
                 channels: int = 4, lr: float = 1e-3, seed: int = 0,
                 mesh=None, noise_source: str = "gauss",
                 noise_flow=None, cam_iso_rows: Optional[List] = None,
                 dtype: str = "float32"):
        self.depth, self.filters, self.lr = depth, filters, lr
        self.compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
        self.noise_source = noise_source
        self.mesh = mesh or make_mesh()
        self.params, self.state = dncnn_init(
            jax.random.PRNGKey(seed), depth, filters, channels)
        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr)
        self.opt_state = self.optimizer.init(self.params)
        self.params = replicate(self.mesh, self.params)
        self.state = replicate(self.mesh, self.state)
        self.opt_state = replicate(self.mesh, self.opt_state)
        self.noise_flow = noise_flow
        rows = cam_iso_rows or [(2, 100.0, 0.000479, 2e-6)]
        self._rows = jnp.asarray(
            [[float(c), float(i), float(b1), float(b2)]
             for (c, i, b1, b2) in rows], jnp.float32)
        self._build_steps()

    # ------------------------------------------------------------- noise gen
    def _gen_noise(self, rng, clean):
        """On-device noise synthesis (ref:train_dncnn_noiseflow.py:150-163,
        213-236). Returns noise with clean's shape."""
        src = self.noise_source
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        if src == "gauss":
            sig = jax.random.uniform(k1, (), minval=MIN_EST_SIGMA,
                                     maxval=MAX_EST_SIGMA) / 255.0
            return sig * jax.random.normal(k2, clean.shape)
        if src == "sdn":
            b1 = jax.random.uniform(k1, (), minval=MIN_CAM_NLF[0],
                                    maxval=MAX_CAM_NLF[0])
            b2 = jax.random.uniform(k2, (), minval=MIN_CAM_NLF[1],
                                    maxval=MAX_CAM_NLF[1])
            sig = jnp.sqrt(b1 * clean + b2)
            return sig * jax.random.normal(k3, clean.shape)
        if src == "camnlf":
            row = self._rows[jax.random.randint(
                k1, (), 0, self._rows.shape[0])]
            sig = jnp.sqrt(row[2] * clean + row[3])
            return sig * jax.random.normal(k2, clean.shape)
        if src == "nf":
            flow, fp, fs = self.noise_flow
            row = self._rows[jax.random.randint(
                k1, (), 0, self._rows.shape[0])]
            b = clean.shape[0]
            cond = {"clean": clean,
                    "nlf0": jnp.zeros((b,)), "nlf1": jnp.zeros((b,)),
                    "iso": jnp.full((b,), row[1]),
                    "cam": jnp.full((b,), row[0])}
            nf_noise = flow.sample(fp, fs, k2, cond, temp=1.0, batch=b,
                                   train=True)
            # 50% Gaussian-sigma augmentation (ref:154-160)
            sig = jax.random.uniform(k3, (), minval=MIN_EST_SIGMA,
                                     maxval=MAX_EST_SIGMA) / 255.0
            gauss = sig * jax.random.normal(k4, clean.shape)
            return jnp.where(jax.random.bernoulli(k1), gauss, nf_noise)
        raise ValueError(f"unknown noise source {src!r}")

    # ------------------------------------------------------------------ jit
    def _build_steps(self):
        optimizer = self.optimizer
        use_real = self.noise_source == "real"

        cdt = self.compute_dtype

        def train_step(params, state, opt_state, rng, clean, noisy):
            if use_real:
                x_noisy = noisy
            else:
                noise = self._gen_noise(rng, clean)
                x_noisy = jnp.clip(clean + noise, 0.0, 1.0)

            def loss_fn(p):
                out, new_state = dncnn_apply(p, state, x_noisy, train=True,
                                             compute_dtype=cdt)
                # sum_squared_error / 2 (ref:244-245)
                return jnp.sum(jnp.square(out - clean)) / 2.0, new_state

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt, loss

        def train_step_idx(params, state, opt_state, rng, clean_all,
                           noisy_all, idx):
            """Device-resident variant: the full train set lives in HBM and
            each step gathers its batch by index on-device — per-step
            host->device traffic is one [B] int32 vector instead of the
            batch tensors (the tunnel's H2D latency made per-batch feeding
            the bottleneck; the reference fed every batch through feed_dict,
            ref:train_dncnn_noiseflow.py:297-300)."""
            return train_step(params, state, opt_state, rng,
                              jnp.take(clean_all, idx, axis=0),
                              jnp.take(noisy_all, idx, axis=0))

        def denoise_step(params, state, noisy):
            out, _ = dncnn_apply(params, state, noisy, train=False,
                                 compute_dtype=cdt)
            return out

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._train_step_idx = jax.jit(train_step_idx,
                                       donate_argnums=(0, 1, 2))
        self._denoise = jax.jit(denoise_step)
        self._staged = None

    # ---------------------------------------------------------------- loops
    def set_lr(self, lr: float) -> None:
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)

    def train_epoch(self, clean: np.ndarray, batch_size: int, rng,
                    noisy: Optional[np.ndarray] = None,
                    shuffle_seed: int = 0,
                    device_resident: Optional[bool] = None) -> float:
        """device_resident (default: auto — on for a single-device mesh)
        stages the full clean/noisy sets in HBM once and feeds each step a
        [B] int32 index vector; per-batch tensors never cross the host link
        again. Falls back to per-batch sharding on multi-device meshes."""
        if device_resident is None:
            device_resident = self.mesh.size == 1
        n = (len(clean) // batch_size) * batch_size
        order = np.random.default_rng(shuffle_seed).permutation(len(clean))[:n]
        losses = []
        if device_resident:
            # NOT id()-keyed: id() values recycle after GC, and in-place
            # mutation of the same array would go undetected — key on shape/
            # dtype plus a cheap strided content hash instead
            key = (_stage_key(clean), _stage_key(noisy))
            if self._staged is None or self._staged[0] != key:
                ca = jax.device_put(jnp.asarray(clean))
                na = (jax.device_put(jnp.asarray(noisy))
                      if noisy is not None else ca)  # same buffer, unused
                self._staged = (key, ca, na)
            _, ca, na = self._staged
            for s in range(0, n, batch_size):
                idx = jnp.asarray(order[s:s + batch_size], jnp.int32)
                rng, k = jax.random.split(rng)
                (self.params, self.state, self.opt_state,
                 loss) = self._train_step_idx(self.params, self.state,
                                              self.opt_state, k, ca, na, idx)
                losses.append(loss)
            return float(jnp.mean(jnp.stack(losses)))
        zeros = np.zeros((batch_size,) + clean.shape[1:], clean.dtype)
        for s in range(0, n, batch_size):
            idx = order[s:s + batch_size]
            cb = shard_batch(self.mesh, clean[idx])
            nb = shard_batch(self.mesh, noisy[idx] if noisy is not None
                             else zeros)
            rng, k = jax.random.split(rng)
            self.params, self.state, self.opt_state, loss = self._train_step(
                self.params, self.state, self.opt_state, k, cb, nb)
            losses.append(loss)
        return float(jnp.mean(jnp.stack(losses)))

    def denoise(self, noisy: np.ndarray, batch_size: int = 0) -> np.ndarray:
        if not batch_size:
            return np.asarray(self._denoise(self.params, self.state,
                                            jnp.asarray(noisy)))
        outs = [np.asarray(self._denoise(self.params, self.state,
                                         jnp.asarray(noisy[s:s + batch_size])))
                for s in range(0, len(noisy), batch_size)]
        return np.concatenate(outs)

    def eval_psnr(self, clean: np.ndarray, noisy: np.ndarray,
                  batch_size: int = 128) -> float:
        den = self.denoise(noisy, batch_size)
        return psnr_metric(clean, np.clip(den, 0.0, 1.0))

    # ------------------------------------------------------------ main loop
    def fit(self, clean: np.ndarray, save_dir: str, epochs: int,
            batch_size: int = 128, noisy: Optional[np.ndarray] = None,
            val_clean: Optional[np.ndarray] = None,
            val_noisy: Optional[np.ndarray] = None,
            initial_epoch: int = 0, save_every: int = 1,
            verbose: bool = True) -> Dict:
        """Epoch loop with per-epoch checkpoints `model_{epoch:03d}.npz`,
        CSV log, LR schedule, and best-PSNR tracking
        (ref:train_dncnn_noiseflow.py:246-300, max_epc_psnr.txt of
        test_dncnn_noiseflow.py:26-31)."""
        os.makedirs(save_dir, exist_ok=True)
        log_path = os.path.join(save_dir, "log.csv")
        history = {"loss": [], "psnr": []}
        best = (-1.0, 0)
        rng = jax.random.PRNGKey(1234)
        for epoch in range(initial_epoch + 1, epochs + 1):
            self.set_lr(lr_schedule(epoch, self.lr))
            t0 = time.time()
            rng, k = jax.random.split(rng)
            loss = self.train_epoch(clean, batch_size, k, noisy=noisy,
                                    shuffle_seed=epoch)
            history["loss"].append(loss)
            val_psnr = ""
            if val_clean is not None and val_noisy is not None:
                p = self.eval_psnr(val_clean, val_noisy, batch_size)
                history["psnr"].append(p)
                if p > best[0]:
                    best = (p, epoch)
                val_psnr = f"{p:.4f}"
            if epoch % save_every == 0:
                save_checkpoint(save_dir, f"{epoch:03d}", self.params,
                                self.state, self.opt_state, epoch)
            with open(log_path, "a", newline="") as f:
                csv.writer(f).writerow([epoch, f"{loss:.4f}", val_psnr,
                                        f"{time.time() - t0:.1f}"])
            if verbose:
                print(f"dncnn epoch {epoch}: loss={loss:.1f} "
                      f"psnr={val_psnr or '-'}", flush=True)
        if best[1] > 0:
            with open(os.path.join(save_dir, "max_epc_psnr.txt"), "w") as f:
                f.write(f"{best[1]} {best[0]:.6f}\n")
        return history

    def load(self, save_dir: str, epoch: Optional[int] = None) -> int:
        path = (os.path.join(save_dir, f"model_{epoch:03d}.npz") if epoch
                else latest_checkpoint(save_dir))
        if path is None or not os.path.exists(path):
            # trainer checkpoints are saved via save_checkpoint -> model.ckpt-*
            path = latest_checkpoint(save_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoint in {save_dir}")
        self.params, self.state, self.opt_state, ep = load_checkpoint(
            path, self.params, self.state, self.opt_state)
        return ep
