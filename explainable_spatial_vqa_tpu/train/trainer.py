"""The unified trainer — replaces the reference's ~15 copy-pasted training
scripts with one engine (SURVEY.md §7 step 6).

Responsibilities:
- optax optimizer from OptimConfig (Adam β=(0.9, 0.999); optional global-norm
  clipping and epoch-step LR decay, matching e.g.
  train_transformer_iqap.py:478-479's StepLR(step_size=10, gamma=0.1)),
- one jitted, mesh-sharded train/eval step: parameters replicated, batch
  sharded over the ``data`` axis; XLA emits the gradient ``psum``,
- epoch loop with early stopping on a monitored metric (save-best + patience,
  the universal reference pattern, train_transformer_iqap.py:481-523),
- orbax checkpoints carrying optimizer state + counters -> exact resume
  (the reference cannot resume; SURVEY.md §5.4).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from explainable_spatial_vqa_tpu.core.config import OptimConfig, TrainConfig
from explainable_spatial_vqa_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from explainable_spatial_vqa_tpu.train.checkpoints import CheckpointStore
from explainable_spatial_vqa_tpu.train.metrics import MetricAccumulator
from explainable_spatial_vqa_tpu.train.prefetch import prefetch

logger = logging.getLogger(__name__)

__all__ = ["TrainState", "Trainer", "build_optimizer"]

LossFn = Callable[[Any, Dict[str, jnp.ndarray], jax.Array, bool], Tuple[jnp.ndarray, Dict]]


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    epoch: jnp.ndarray

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
        )


def build_optimizer(
    optim: OptimConfig, steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    if optim.lr_step_size and steps_per_epoch:
        schedule = optax.exponential_decay(
            init_value=optim.learning_rate,
            transition_steps=optim.lr_step_size * steps_per_epoch,
            decay_rate=optim.lr_gamma,
            staircase=True,
        )
    else:
        schedule = optim.learning_rate
    parts = []
    if optim.grad_clip_norm:
        parts.append(optax.clip_by_global_norm(optim.grad_clip_norm))
    if optim.weight_decay:
        parts.append(optax.adamw(schedule, b1=optim.beta1, b2=optim.beta2,
                                 weight_decay=optim.weight_decay))
    else:
        parts.append(optax.adam(schedule, b1=optim.beta1, b2=optim.beta2))
    return optax.chain(*parts)


class Trainer:
    """Generic loop around a user loss function.

    ``loss_fn(params, batch, rng, train) -> (loss, metrics)`` where metrics
    are count-style (summable across batches).
    """

    def __init__(
        self,
        loss_fn: LossFn,
        params: Any,
        optim_config: OptimConfig,
        train_config: TrainConfig,
        mesh=None,
        steps_per_epoch: Optional[int] = None,
        eval_fn: Optional[LossFn] = None,
        checkpoint_dir: Optional[str] = None,
    ):
        self.loss_fn = loss_fn
        self.eval_loss_fn = eval_fn or loss_fn
        self.optim_config = optim_config
        self.train_config = train_config
        if mesh is not None:
            self.mesh = mesh
        elif jax.process_count() > 1:
            # multi-host: process-major device order (NOT topology-reordered)
            # so host_batch_slice rows land on each host's own chips
            from explainable_spatial_vqa_tpu.parallel.multihost import make_global_mesh

            self.mesh = make_global_mesh(
                train_config.mesh_shape, train_config.mesh_axes
            )
        else:
            self.mesh = make_mesh(train_config.mesh_shape, train_config.mesh_axes)
        self.tx = build_optimizer(optim_config, steps_per_epoch)
        self.state = TrainState.create(params, self.tx)
        self._replicated = replicated(self.mesh)
        self._batch_shard = batch_sharding(self.mesh)
        self.state = jax.device_put(self.state, self._replicated)
        self.store = (
            CheckpointStore(checkpoint_dir or train_config.checkpoint_dir)
            if checkpoint_dir is not False
            else None
        )
        self.best_metric = -np.inf
        self.best_params = None
        self.stale_epochs = 0

        tx = self.tx
        loss = self.loss_fn

        @jax.jit
        def _train_step(state: TrainState, batch, rng):
            def wrapped(params):
                return loss(params, batch, rng, True)

            (value, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=params, opt_state=opt_state, step=state.step + 1)
            metrics = dict(metrics)
            metrics["loss_sum"] = value
            metrics["batches"] = jnp.ones(())
            return new_state, metrics

        eval_loss = self.eval_loss_fn

        @jax.jit
        def _eval_step(params, batch, rng):
            value, metrics = eval_loss(params, batch, rng, False)
            metrics = dict(metrics)
            metrics["loss_sum"] = value
            metrics["batches"] = jnp.ones(())
            return metrics

        self._train_step = _train_step
        self._eval_step = _eval_step

    # -- loops --------------------------------------------------------------

    def _put(self, batch: Dict[str, np.ndarray]):
        if jax.process_count() > 1:
            # multi-host: each process holds only its host_batch_slice rows;
            # assemble global sharded arrays without cross-host transfer
            from explainable_spatial_vqa_tpu.parallel.multihost import global_batch

            return global_batch(batch, self.mesh)

        def put(x):
            x = jnp.asarray(x)
            # scalars (e.g. the scheduled-sampling p) replicate; arrays shard
            # their leading batch dim over the data axis
            shard = self._replicated if x.ndim == 0 else self._batch_shard
            return jax.device_put(x, shard)

        return jax.tree_util.tree_map(put, batch)

    def train_epoch(self, data: Iterable[Dict[str, np.ndarray]], rng: jax.Array) -> MetricAccumulator:
        acc = MetricAccumulator()
        for i, batch in enumerate(prefetch(data)):
            rng, step_rng = jax.random.split(rng)
            self.state, metrics = self._train_step(self.state, self._put(batch), step_rng)
            acc.update(metrics)
            if self.train_config.log_every and (i + 1) % self.train_config.log_every == 0:
                logger.info("step %d loss %.4f", i + 1, acc.mean("loss_sum"))
        return acc

    def evaluate(self, data: Iterable[Dict[str, np.ndarray]], rng: jax.Array) -> MetricAccumulator:
        acc = MetricAccumulator()
        for batch in prefetch(data):
            rng, step_rng = jax.random.split(rng)
            acc.update(self._eval_step(self.state.params, self._put(batch), step_rng))
        return acc

    def fit(
        self,
        train_batches: Callable[[int], Iterable[Dict[str, np.ndarray]]],
        val_batches: Optional[Callable[[], Iterable[Dict[str, np.ndarray]]]] = None,
        monitor: Tuple[str, str] = ("answer_correct", "answer_total"),
        num_epochs: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Run the full training loop; returns a history dict.

        ``train_batches(epoch)`` / ``val_batches()`` return fresh iterators.
        ``monitor`` is a (numerator, denominator) metric-ratio maximized for
        early stopping and best-checkpointing.
        """
        cfg = self.train_config
        num_epochs = num_epochs or cfg.num_epochs
        rng = jax.random.PRNGKey(cfg.seed if seed is None else seed)

        start_epoch = 0
        if self.store is not None and cfg.resume:
            restored = self.store.restore(template=self._restore_template())
            if restored is not None:
                self.state = jax.device_put(restored["state"], self._replicated)
                self.best_metric = float(restored["best_metric"])
                self.stale_epochs = int(restored["stale_epochs"])
                start_epoch = int(self.state.epoch)
                # reload the on-disk best snapshot too: otherwise a resumed
                # run whose validation never re-beats the restored
                # best_metric would end with best_params=None and
                # evaluate_best would silently score the FINAL params
                best = self.store.restore_best(
                    {"params": jax.device_get(self.state.params)}
                )
                if best is not None:
                    self.best_params = best["params"]
                logger.info("resumed from epoch %d%s", start_epoch,
                            "" if best is None else " (best snapshot reloaded)")

        history = {"train": [], "val": []}
        for epoch in range(start_epoch, num_epochs):
            # epoch-keyed (not sequentially split) so a resumed run uses the
            # SAME dropout/augmentation keys an uninterrupted run would use
            # at this epoch, instead of replaying epoch 0's sequence
            epoch_rng = jax.random.fold_in(rng, epoch)
            train_rng, eval_rng = jax.random.split(epoch_rng)
            t0 = time.time()
            train_acc = self.train_epoch(train_batches(epoch), train_rng)
            history["train"].append(train_acc.totals)
            logger.info(
                "epoch %d train loss %.4f (%.1fs)",
                epoch, train_acc.mean("loss_sum"), time.time() - t0,
            )

            self.state = self.state.replace(epoch=jnp.asarray(epoch + 1, jnp.int32))

            if val_batches is not None:
                val_acc = self.evaluate(val_batches(), eval_rng)
                if not val_acc.totals:
                    logger.warning(
                        "validation yielded ZERO batches (dataset smaller than "
                        "batch size x mesh?) — early stopping and best-checkpoint "
                        "selection are inactive"
                    )
                history["val"].append(val_acc.totals)
                metric = val_acc.ratio(*monitor)
                logger.info("epoch %d val loss %.4f monitor %.4f",
                            epoch, val_acc.mean("loss_sum"), metric)
                if metric > self.best_metric:
                    self.best_metric = metric
                    self.best_params = jax.device_get(self.state.params)
                    self.stale_epochs = 0
                    if self.store is not None:
                        self.store.save_best({"params": self.best_params})
                else:
                    self.stale_epochs += 1

            if self.store is not None and (
                (epoch + 1) % cfg.checkpoint_interval == 0 or epoch + 1 == num_epochs
            ):
                self.store.save(epoch + 1, self._save_payload())

            if val_batches is not None and self.stale_epochs >= cfg.patience:
                logger.info("early stopping at epoch %d", epoch)
                break

        if self.store is not None:
            self.store.save(int(self.state.epoch), self._save_payload())
            self.store.wait()
        return history

    def evaluate_best(
        self, data: Iterable[Dict[str, np.ndarray]], rng: Optional[jax.Array] = None
    ) -> MetricAccumulator:
        """Evaluate with the best-so-far parameters (the reference reloads the
        best state for its final test pass, train_transformer_iqap.py:523)."""
        if self.best_params is None:
            logger.warning(
                "evaluate_best: no best checkpoint recorded (validation never "
                "improved or never ran) — evaluating CURRENT params instead"
            )
        params = self.best_params if self.best_params is not None else self.state.params
        params = jax.device_put(params, self._replicated)
        rng = jax.random.PRNGKey(0) if rng is None else rng
        acc = MetricAccumulator()
        for batch in data:
            rng, step_rng = jax.random.split(rng)
            acc.update(self._eval_step(params, self._put(batch), step_rng))
        return acc

    def _save_payload(self):
        return {
            "state": jax.device_get(self.state),
            "best_metric": np.asarray(self.best_metric),
            "stale_epochs": np.asarray(self.stale_epochs),
        }

    def _restore_template(self):
        return {
            "state": jax.device_get(self.state),
            "best_metric": np.asarray(0.0),
            "stale_epochs": np.asarray(0),
        }
