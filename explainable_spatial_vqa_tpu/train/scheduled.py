"""Chain-level scheduled sampling for the thesis executor.

The reference (and the flat ``executor`` pipeline here) trains every step
teacher-forced: dependency inputs are ground-truth upstream outputs
(training_bb_and_tokensv2-1_hungarian.py data assembly).  At chained
inference the executor instead consumes its OWN upstream predictions, and
the resulting distribution shift costs accuracy (DEMO.md: grounding noise, a
stateless approximation, recovers ~4 points).

This module closes the loop properly (DAgger-style): each training step
1. runs the full chained pass with the CURRENT parameters under
   ``stop_gradient`` (the same ``infer.chain.chained_forward`` loop that
   serves inference), yielding the model's own per-step box/token caches;
2. builds MIXED dependency caches — per (question, step), with probability
   ``p`` the model's predicted outputs replace the ground-truth outputs;
3. computes the per-step set loss with inputs gathered from the mixed
   caches, masked to active+valid steps.

``p`` ramps linearly from 0 to ``ExecutorConfig.scheduled_p_max`` over
``scheduled_ramp_epochs`` (classic scheduled-sampling curriculum, Bengio et
al. 2015), fed per batch through ``batch["p_sample"]`` so one compiled step
serves the whole schedule.  Everything stays inside one jit: the no-grad
chained pass is a ``fori_loop``, the loss pass a ``scan`` over step
positions — both TPU-friendly, no host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.infer.chain import (
    ChainState,
    chained_forward,
    gather_step_inputs,
)
from explainable_spatial_vqa_tpu.train.losses import executor_set_loss

__all__ = ["gt_chain_state", "make_scheduled_loss_fn", "schedule_p"]


def schedule_p(epoch: int, cfg: ExecutorConfig) -> float:
    """Linear 0 -> p_max ramp over the first ``scheduled_ramp_epochs``.

    Epoch 0 is fully teacher-forced (p=0); p reaches p_max at
    ``epoch == scheduled_ramp_epochs`` and stays there.
    """
    if cfg.scheduled_p_max <= 0.0:
        return 0.0
    ramp = max(cfg.scheduled_ramp_epochs, 1)
    return float(cfg.scheduled_p_max) * min(1.0, epoch / ramp)


def gt_chain_state(batch: Dict[str, jnp.ndarray], cfg: ExecutorConfig) -> ChainState:
    """Ground-truth caches in the inference runner's ChainState layout."""
    is_box = batch["is_box_branch"]
    valid = batch["step_valid"]
    box_mask = batch["target_box_mask"] & (is_box & valid)[..., None]
    return ChainState(
        box_cache=batch["target_boxes"].astype(jnp.float32),
        box_mask=box_mask,
        conf_cache=box_mask.astype(jnp.float32),
        token_cache=batch["token_target"].astype(jnp.int32),
        token_branch=(~is_box) & valid,
        routing=(~is_box).astype(jnp.int32),
    )


def make_scheduled_loss_fn(model, cfg: ExecutorConfig) -> Callable:
    """Build the Trainer-compatible loss_fn(params, batch, rng, train).

    Expects chain-structured batches (train.datasets.executor_chain_step_arrays
    plus ``image`` and a scalar ``p_sample``).
    """

    def loss_fn(params: Any, batch: Dict[str, jnp.ndarray], rng: jax.Array, train: bool):
        functions = batch["functions"]
        deps = batch["deps"]
        num_steps = batch["num_steps"]
        n, s = functions.shape

        variables = {"params": params}
        image = model.apply(variables, batch["image"], method=model.precompute_image)

        state = gt_chain_state(batch, cfg)
        if train:
            # the model's own chained predictions, current params, no grads
            frozen = jax.lax.stop_gradient((params, image))
            pred_state = chained_forward(
                model, {"params": frozen[0]}, frozen[1], functions, deps,
                num_steps, cfg, max_steps=s, image_precomputed=True,
            )
            pred_state = jax.lax.stop_gradient(pred_state)
            p = batch.get("p_sample", jnp.zeros(()))
            # fold index outside [0, s) U [1000, 1000+s): the per-step
            # dropout/noise keys use fold_in(rng, k) and fold_in(rng, 1000+k)
            use_pred = jax.random.bernoulli(
                jax.random.fold_in(rng, 100_003), p, (n, s)
            )
            state = ChainState(
                box_cache=jnp.where(use_pred[..., None, None],
                                    pred_state.box_cache, state.box_cache),
                box_mask=jnp.where(use_pred[..., None],
                                   pred_state.box_mask, state.box_mask),
                conf_cache=jnp.where(use_pred[..., None],
                                     pred_state.conf_cache, state.conf_cache),
                token_cache=jnp.where(use_pred, pred_state.token_cache,
                                      state.token_cache),
                token_branch=jnp.where(use_pred, pred_state.token_branch,
                                       state.token_branch),
                routing=jnp.where(use_pred, pred_state.routing, state.routing),
            )

        def body(carry, k):
            input_boxes, input_mask, text, text_mask = gather_step_inputs(
                state, functions[:, k], deps[:, k, 0], deps[:, k, 1],
                cfg.max_input_boxes,
            )
            if train and (cfg.input_box_noise > 0.0 or cfg.input_box_drop > 0.0):
                # stateless grounding noise composes with the scheduled
                # mixture (jitter whatever inputs the mixture produced)
                from explainable_spatial_vqa_tpu.train.losses import (
                    perturb_input_boxes,
                )

                input_boxes, input_mask = perturb_input_boxes(
                    input_boxes, input_mask, jax.random.fold_in(rng, 1000 + k),
                    cfg.input_box_noise, cfg.input_box_drop,
                )
            rngs = {"dropout": jax.random.fold_in(rng, k)} if train else {}
            out = model.apply(
                variables, image, input_boxes, input_mask, text, text_mask,
                image_precomputed=True, deterministic=not train, rngs=rngs,
            )
            active = (k < num_steps) & batch["step_valid"][:, k]
            w = active.astype(jnp.float32)
            losses = executor_set_loss(
                out, batch["target_boxes"][:, k], batch["target_box_mask"][:, k],
                batch["token_target"][:, k], batch["is_box_branch"][:, k], cfg,
                sample_weight=w,
            )
            n_active = jnp.sum(w)
            routing_pred = jnp.argmax(out["routing_logits"], -1)
            routing_target = 1 - batch["is_box_branch"][:, k].astype(jnp.int32)
            token_pred = jnp.argmax(out["token_logits"], -1)
            tok_w = w * (~batch["is_box_branch"][:, k])
            stats = jnp.array([
                losses["loss"] * n_active,
                n_active,
                jnp.sum((routing_pred == routing_target) * w),
                jnp.sum((token_pred == batch["token_target"][:, k]) * tok_w),
                jnp.sum(tok_w),
            ])
            return carry + stats, None

        totals, _ = jax.lax.scan(body, jnp.zeros(5), jnp.arange(s))
        loss = totals[0] / jnp.maximum(totals[1], 1.0)
        metrics = {
            "routing_correct": totals[2],
            "routing_total": totals[1],
            "token_correct": totals[3],
            "token_total": totals[4],
        }
        return loss, metrics

    return loss_fn
