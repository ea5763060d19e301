"""Trainer: sharded training on the virtual 8-device mesh, early stopping,
checkpoint/resume, split parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from explainable_spatial_vqa_tpu.core.config import (
    OptimConfig,
    StepSeq2SeqConfig,
    TrainConfig,
)
from explainable_spatial_vqa_tpu.models.step_executor import StepExecutorSeq2Seq
from explainable_spatial_vqa_tpu.train.data import Subset, batches, train_val_test_split
from explainable_spatial_vqa_tpu.train.losses import cross_entropy
from explainable_spatial_vqa_tpu.train.metrics import masked_token_metrics
from explainable_spatial_vqa_tpu.train.trainer import Trainer

CFG = StepSeq2SeqConfig(
    vocab_size=16, d_model=16, num_heads=2, encoder_layers=1, decoder_layers=1,
    ffn_dim=32, max_src_len=6, max_tgt_len=5, num_image_tokens=4, image_feature_dim=8,
)


def test_split_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.model_selection")
    n = 137
    idx = list(range(n))
    ref_tv, ref_test = sklearn.train_test_split(idx, test_size=0.1, random_state=42)
    ref_train, ref_val = sklearn.train_test_split(
        ref_tv, test_size=0.1 / 0.9, random_state=42
    )
    train, val, test = train_val_test_split(n, 0.1, 0.1, seed=42)
    np.testing.assert_array_equal(train, ref_train)
    np.testing.assert_array_equal(val, ref_val)
    np.testing.assert_array_equal(test, ref_test)


def _synthetic_data(n=64, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(n, CFG.num_image_tokens, CFG.image_feature_dim).astype(np.float32)
    src = rng.randint(3, CFG.vocab_size, (n, 5)).astype(np.int32)
    # target = deterministic function of src (copy first 4 tokens, shifted)
    tgt = np.zeros((n, 5), np.int32)
    tgt[:, 0] = 1  # <START>
    tgt[:, 1:4] = src[:, :3]
    tgt[:, 4] = 2  # <END>
    return {"image": img, "src": src, "tgt": tgt}


def _make_trainer(tmp_path, resume=True):
    model = StepExecutorSeq2Seq(CFG)
    data = _synthetic_data()
    variables = model.init(
        jax.random.PRNGKey(0), data["image"][:2], data["src"][:2], data["tgt"][:2, :-1]
    )

    def loss_fn(params, batch, rng, train):
        logits = model.apply(
            {"params": params},
            batch["image"], batch["src"], batch["tgt"][:, :-1],
            batch["src"] != 0,
            deterministic=not train,
            rngs={"dropout": rng} if train else {},
        )
        targets = batch["tgt"][:, 1:]
        loss = cross_entropy(logits, targets, ignore_index=0)
        pred = jnp.argmax(logits, axis=-1)
        return loss, masked_token_metrics(pred, targets)

    trainer = Trainer(
        loss_fn,
        variables["params"],
        OptimConfig(learning_rate=3e-3),
        TrainConfig(batch_size=16, num_epochs=8, patience=10, checkpoint_interval=2,
                    resume=resume, log_every=0),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    return trainer, data


def test_trainer_fit_and_resume(tmp_path):
    trainer, data = _make_trainer(tmp_path)
    subset = Subset(data, np.arange(64))

    def train_batches(epoch):
        return batches(subset, 16, shuffle=True, seed=0, epoch=epoch)

    def val_batches():
        return batches(subset, 16, shuffle=False)

    history = trainer.fit(
        train_batches, val_batches, monitor=("token_correct", "token_total"),
        num_epochs=4,
    )
    first_loss = history["train"][0]["loss_sum"] / history["train"][0]["batches"]
    last_loss = history["train"][-1]["loss_sum"] / history["train"][-1]["batches"]
    assert last_loss < first_loss
    assert trainer.best_metric > 0.2  # improving on the synthetic task
    trainer.store.wait()

    # resume: new trainer picks up epoch counter and continues to epoch 6
    trainer2, _ = _make_trainer(tmp_path)
    history2 = trainer2.fit(
        train_batches, val_batches, monitor=("token_correct", "token_total"),
        num_epochs=6,
    )
    assert int(trainer2.state.epoch) == 6
    assert len(history2["train"]) == 2  # only epochs 4..5 ran
    trainer2.store.close()


def test_trainer_runs_on_mesh(tmp_path):
    """Train state must be replicated and batches sharded over all 8 devices."""
    trainer, data = _make_trainer(tmp_path / "mesh", resume=False)
    assert trainer.mesh.devices.size == 8
    batch = {k: v[:16] for k, v in data.items()}
    put = trainer._put(batch)
    shard_devices = {d.id for d in put["image"].sharding.device_set}
    assert len(shard_devices) == 8
    state, metrics = trainer._train_step(trainer.state, put, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_sum"]))


def test_prefetch_iterator():
    from explainable_spatial_vqa_tpu.train.prefetch import prefetch

    assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))
    assert list(prefetch([], depth=2)) == []

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer failed"):
        next(it)
