"""Device meshes and sharding rules."""

from explainable_spatial_vqa_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
