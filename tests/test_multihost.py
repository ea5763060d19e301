"""Multi-host execution path (parallel/multihost.py).

The sandbox is single-process, so the cross-host *math* (which global rows
each host reads, slice disjointness/cover) is tested directly, and the
process-count=1 cluster dryrun — jax.distributed.initialize with an
explicit one-process coordinator, the VERDICT r2 #4 acceptance gate — runs
in a subprocess (distributed init is global interpreter state).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from explainable_spatial_vqa_tpu.parallel.multihost import host_batch_slice  # noqa: E402
from explainable_spatial_vqa_tpu.train.data import Subset, batches  # noqa: E402


def test_host_batch_slice_disjoint_exact_cover():
    for pc in (1, 2, 4, 8):
        rows = []
        for pi in range(pc):
            s = host_batch_slice(64, pi, pc)
            rows.extend(range(64)[s])
        assert rows == list(range(64))  # disjoint, ordered, complete


def test_host_batch_slice_rejects_indivisible():
    with pytest.raises(ValueError):
        host_batch_slice(10, 0, 4)


def test_batches_per_host_slices_reassemble_global_batch():
    """Each simulated host's batches, concatenated in process order, must
    equal the single-host global batches exactly (same permutation seed)."""
    rng = np.random.RandomState(0)
    arrays = {"x": rng.randn(50, 3).astype(np.float32),
              "y": np.arange(50, dtype=np.int32)}
    sub = Subset(arrays, np.arange(50))
    kw = dict(batch_size=16, shuffle=True, seed=7, epoch=3)

    global_batches = list(batches(sub, **kw))
    pc = 4
    per_host = [list(batches(sub, **kw, process_index=pi, process_count=pc))
                for pi in range(pc)]

    assert len(global_batches) == 3  # 50 // 16 (drop_last)
    for b, g in enumerate(global_batches):
        for key in arrays:
            local = np.concatenate([per_host[pi][b][key] for pi in range(pc)])
            np.testing.assert_array_equal(local, g[key])
        assert per_host[0][b][key].shape[0] == 4  # 16 / 4 rows per host


DRYRUN = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from explainable_spatial_vqa_tpu.parallel import multihost

multihost.initialize("localhost:{port}", num_processes=1, process_id=0)
assert jax.process_count() == 1 and jax.device_count() == 8

mesh = multihost.make_global_mesh((-1,), ("data",))
assert mesh.devices.shape == (8,)

# global_batch must equal device_put with the same shardings when pc=1
from explainable_spatial_vqa_tpu.parallel.mesh import batch_sharding
batch = {{"x": np.arange(32, dtype=np.float32).reshape(16, 2),
          "p": np.float32(0.25)}}
g = multihost.global_batch(batch, mesh)
assert g["x"].shape == (16, 2) and g["p"].shape == ()
np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
assert g["x"].sharding == batch_sharding(mesh)

# one sharded train step end-to-end through the Trainer multihost path
from explainable_spatial_vqa_tpu.core.config import OptimConfig, TrainConfig
from explainable_spatial_vqa_tpu.train.trainer import Trainer
from explainable_spatial_vqa_tpu.train.data import Subset, batches

def loss_fn(params, batch, rng, train):
    pred = batch["x"] @ params["w"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, {{"answer_correct": jnp.zeros(()), "answer_total": jnp.ones(())}}

rng = np.random.RandomState(0)
arrays = {{"x": rng.randn(64, 4).astype(np.float32),
           "y": rng.randn(64, 1).astype(np.float32)}}
sub = Subset(arrays, np.arange(64))
trainer = Trainer(loss_fn, {{"w": jnp.zeros((4, 1))}},
                  OptimConfig(learning_rate=1e-2), TrainConfig(num_epochs=1),
                  checkpoint_dir=False)
assert trainer.mesh.devices.shape == (8,)
pi, pc = jax.process_index(), jax.process_count()
acc = trainer.train_epoch(
    batches(sub, 16, seed=0, process_index=pi, process_count=pc),
    jax.random.PRNGKey(0))
assert np.isfinite(acc.mean("loss_sum"))
print("MULTIHOST_DRYRUN_OK", acc.mean("loss_sum"))
"""


def test_process_count_1_cluster_dryrun():
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", DRYRUN.format(port=port)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "MULTIHOST_DRYRUN_OK" in out.stdout
