"""Device-mesh data parallelism (the reference's DDP+SyncBN replacement).

The reference spawns one process per GPU with NCCL DDP + MinkowskiSyncBatchNorm
(models/training.py:286-297,335-340; models/model.py:23-25). TPU-native design:

  * one process, a 1-D `jax.sharding.Mesh` over the 'data' axis,
  * `shard_map` of the train step: each device consumes its own padded
    SparseBatch shard (leading axis D, stacked by
    datasets/batching.collate_device_batches),
  * gradients `pmean`'d over ICI inside the step (engine/state.make_train_step),
  * BatchNorm statistics `psum`'d over the same axis via MaskedBatchNorm's
    axis_name -> SyncBN for free,
  * multi-host: call `jax.distributed.initialize()` before building the mesh —
    the same code then spans slices (collectives ride ICI within a slice, DCN
    across).

Spatial sharding (one huge scene split across devices — the reference instead
downsamples, SURVEY.md §2.9) uses the same machinery: the host splits a scene's
voxels into per-device shards with self-contained neighbor maps.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from box2mask_tpu.engine import state as S

AXIS = 'data'


def make_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def make_parallel_train_step(cfg, model, tx, mesh):
    """Returns step(state, stacked_batch, lr, bb_w, cs_w) -> (state, metrics).
    `stacked_batch` leaves have leading axis len(mesh)."""
    inner = S.make_train_step(cfg, model, tx, axis_name=AXIS)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(AXIS), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def sharded(state, batch, lr, bb_w, cs_w):
        local = jax.tree.map(lambda x: x[0], batch)   # drop size-1 device axis
        new_state, ld = inner(state, local, lr, bb_w, cs_w)
        return new_state, ld

    return jax.jit(sharded, donate_argnums=(0,))


def make_parallel_val_step(cfg, model, mesh):
    import jax.numpy as jnp
    from box2mask_tpu.nn import losses as L

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(), P()),
        out_specs=P(),
        check_vma=False)
    def sharded(params, batch_stats, batch, bb_w, cs_w):
        local = jax.tree.map(lambda x: x[0], batch)
        out = model.apply({'params': params, 'batch_stats': batch_stats},
                          local, train=False)
        ld = L.compute_losses(cfg, out, local, bb_w, cs_w)
        return jax.lax.pmean(ld, AXIS)

    return jax.jit(sharded)
