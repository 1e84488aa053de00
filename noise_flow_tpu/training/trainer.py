"""Training/eval/sampling orchestration.

Re-design of ref:train_noise_flow.py:30-541. The reference drove one TF
session from 16 hogwild Python threads (ref:train_noise_flow.py:30-77) — all
of that collapses into ONE jitted, sharded train step: batch sharded over the
'data' mesh axis, parameters replicated, gradient all-reduce inserted by XLA,
BN state threaded functionally (no races, bitwise deterministic).

Epoch schedule, TSV logs (train/test/sample.txt columns), best-model tracking,
and the NLL_G/NLL_SDN baseline columns match the reference
(ref:train_noise_flow.py:334-348,384-535).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from noise_flow_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from noise_flow_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from noise_flow_tpu.utils.logger import ResultLogger
from noise_flow_tpu.utils.metrics import calc_kldiv_mb, kl_div_3_data


def make_optimizer(cfg):
    """Adam beta1=.9 beta2=.999 eps=1e-8, or SGD momentum .9
    (ref:train_noise_flow.py:187-198)."""
    if cfg.optim == "adam":
        return optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    if cfg.optim == "sgd":
        return optax.sgd(cfg.lr, momentum=0.9)
    raise ValueError(f"unknown optimizer {cfg.optim!r}")


def batch_to_cond(mb: Dict) -> Dict:
    return {
        "clean": mb["_y"],
        "nlf0": mb["nlf0"], "nlf1": mb["nlf1"],
        "iso": mb["iso"], "cam": mb["cam"],
    }


class Trainer:
    def __init__(self, flow, cfg, mesh=None, param_inits=None):
        self.flow = flow
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        self.optimizer = make_optimizer(cfg)
        self.params, self.state = flow.init(
            jax.random.PRNGKey(cfg.seed), param_inits)
        # condSDN is a non-trainable baseline: evaluate only, never step
        # (ref:train_noise_flow.py:189).
        self.trainable = cfg.sidd_cond != "condSDN"
        self.opt_state = self.optimizer.init(self.params)
        self.params = replicate(self.mesh, self.params)
        self.state = replicate(self.mesh, self.state)
        self.opt_state = replicate(self.mesh, self.opt_state)
        self._build_steps()

    # ------------------------------------------------------------------ jit
    def _build_steps(self):
        flow, optimizer = self.flow, self.optimizer

        def train_step(params, state, opt_state, batch):
            def loss_fn(p):
                nll, sd_z, new_state = flow.loss(
                    p, state, batch["_x"], batch_to_cond(batch), train=True)
                return nll, (sd_z, new_state)

            (nll, (sd_z, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt, nll, sd_z

        def eval_step(params, state, batch):
            nll, sd_z, _ = flow.loss(
                params, state, batch["_x"], batch_to_cond(batch), train=False)
            return nll, sd_z

        def sample_step(params, state, rng, batch, temp):
            cond = batch_to_cond(batch)
            x = flow.sample(params, state, rng, cond, temp,
                            batch=batch["_y"].shape[0], train=False)
            return x

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._eval_step = jax.jit(eval_step)
        self._sample_step = jax.jit(sample_step, static_argnums=(4,))

    # ---------------------------------------------------------------- loops
    def _put(self, mb: Dict) -> Dict:
        keep = {k: mb[k] for k in ("_x", "_y", "nlf0", "nlf1", "iso", "cam")}
        return shard_batch(self.mesh, keep)

    def train_epoch(self, batches: Iterable[Dict]):
        losses, sdzs = [], []
        for mb in batches:
            b = self._put(mb)
            if self.trainable:
                self.params, self.state, self.opt_state, nll, sd_z = \
                    self._train_step(self.params, self.state, self.opt_state, b)
            else:
                nll, sd_z = self._eval_step(self.params, self.state, b)
            losses.append(nll)
            sdzs.append(sd_z)
        return float(jnp.mean(jnp.stack(losses))), float(jnp.mean(jnp.stack(sdzs)))

    def eval_epoch(self, batches: Iterable[Dict]):
        losses, sdzs = [], []
        for mb in batches:
            nll, sd_z = self._eval_step(self.params, self.state, self._put(mb))
            losses.append(nll)
            sdzs.append(sd_z)
        return float(jnp.mean(jnp.stack(losses))), float(jnp.mean(jnp.stack(sdzs)))

    def sample_epoch(self, batches: Iterable[Dict], temp: float, rng,
                     sc_sd: float = 1.0, fix_cam_iso: bool = True,
                     compute_kld: bool = True):
        """Per-epoch sampling diagnostics (ref:train_noise_flow.py:139-184):
        sample with (optionally) fixed cam=S6 iso=100, push samples back
        through the inverse for their NLL, and compute marginal KLDs."""
        nlf_s6 = {100: 0.000479, 400: 0.001774, 800: 0.003696,
                  1600: 0.008211, 3200: 0.019930}
        losses, sdzs, klds = [], [], []
        for mb in batches:
            mb = dict(mb)
            if fix_cam_iso:
                b = mb["_x"].shape[0]
                mb["iso"] = np.full((b,), 100.0, np.float32)
                mb["cam"] = np.full((b,), 2.0, np.float32)
                # reference feeds nlf0 == nlf1 == table[iso][0]
                # (ref:train_noise_flow.py:158-159)
                mb["nlf0"] = np.full((b,), nlf_s6[100], np.float32)
                mb["nlf1"] = np.full((b,), nlf_s6[100], np.float32)
            db = self._put(mb)
            rng, k = jax.random.split(rng)
            x_sample = self._sample_step(self.params, self.state, k, db, float(temp))
            nll, sd_z = self._eval_step(
                self.params, self.state, {**db, "_x": x_sample})
            losses.append(nll)
            sdzs.append(sd_z)
            if compute_kld:
                xs = np.asarray(x_sample)
                klds.append(calc_kldiv_mb(mb, xs, sc_sd))
        kld = np.mean(np.stack(klds), axis=0) if klds else np.zeros(4)
        return (float(jnp.mean(jnp.stack(losses))),
                float(jnp.mean(jnp.stack(sdzs))), kld)

    # ------------------------------------------------------------ main loop
    def fit(self, train_batches_fn, test_batches_fn, logdir: str,
            epochs: Optional[int] = None, nll_gauss: float = 0.0,
            nll_sdn: float = 0.0, sc_sd: float = 1.0,
            do_sampling: bool = True, verbose: bool = True):
        """Full epoch loop with the reference's test gating
        (ref:train_noise_flow.py:384-535). *_batches_fn are callables
        returning fresh batch iterators per epoch."""
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        os.makedirs(logdir, exist_ok=True)
        ckpt_dir = os.path.join(logdir, "ckpt")

        cols = ["epoch", "NLL", "NLL_G", "NLL_SDN", "sdz"]
        train_logger = ResultLogger(os.path.join(logdir, "train.txt"),
                                    cols + ["train_time"], cfg.continue_training)
        test_logger = ResultLogger(os.path.join(logdir, "test.txt"),
                                   cols + ["msg"], cfg.continue_training)
        sample_logger = ResultLogger(
            os.path.join(logdir, "sample.txt"),
            cols + ["sample_time", "KLD_G", "KLD_NLF", "KLD_NF", "KLD_R"],
            cfg.continue_training)

        start_epoch = 1
        if cfg.continue_training:
            last = latest_checkpoint(ckpt_dir)
            if last:
                self.params, self.state, self.opt_state, ep = load_checkpoint(
                    last, self.params, self.state, self.opt_state)
                start_epoch = ep + 1

        best_nll = np.inf
        rng = jax.random.PRNGKey(cfg.seed + 1)
        train_time = 0.0
        history = {"train": [], "test": [], "sample": []}

        for epoch in range(start_epoch, epochs + 1):
            do_test = (epoch < 10 or (epoch < 100 and epoch % 10 == 0)
                       or epoch % cfg.epochs_full_valid == 0)
            is_best = 0
            if do_test:
                ts_nll, ts_sdz = self.eval_epoch(test_batches_fn())
                history["test"].append(ts_nll)
                save_checkpoint(ckpt_dir, epoch, self.params, self.state,
                                self.opt_state, epoch)
                if ts_nll < best_nll:
                    best_nll = ts_nll
                    save_checkpoint(ckpt_dir, "best", self.params, self.state,
                                    self.opt_state, epoch)
                    is_best = 1
                test_logger.log({"epoch": epoch, "NLL": ts_nll,
                                 "NLL_G": nll_gauss, "NLL_SDN": nll_sdn,
                                 "sdz": ts_sdz, "msg": is_best})

            if do_sampling and do_test:
                t0 = time.time()
                rng, k = jax.random.split(rng)
                sm_nll, sm_sdz, kld = self.sample_epoch(
                    test_batches_fn(), cfg.temp, k, sc_sd)
                history["sample"].append(sm_nll)
                sample_logger.log({
                    "epoch": epoch, "NLL": sm_nll, "NLL_G": nll_gauss,
                    "NLL_SDN": nll_sdn, "sdz": sm_sdz,
                    "sample_time": time.time() - t0,
                    "KLD_G": kld[0], "KLD_NLF": kld[1],
                    "KLD_NF": kld[2], "KLD_R": kld[3]})

            t0 = time.time()
            tr_nll, tr_sdz = self.train_epoch(train_batches_fn())
            train_time += time.time() - t0
            history["train"].append(tr_nll)
            train_logger.log({"epoch": epoch, "NLL": tr_nll,
                              "NLL_G": nll_gauss, "NLL_SDN": nll_sdn,
                              "sdz": tr_sdz, "train_time": int(train_time)})
            if verbose and do_test:
                print(f"E={epoch} tL={tr_nll:9.1f} sL={history['test'][-1]:9.1f} "
                      f"SDr={tr_sdz:.2f} B={is_best}", flush=True)
        for lg in (train_logger, test_logger, sample_logger):
            lg.close()
        return history
