"""Data-parallel shard_map training over the 8-device virtual CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2mask_tpu.engine import state as S
from box2mask_tpu.parallel import mesh as M
from box2mask_tpu.datasets.batching import collate_device_batches
from tests.test_model_forward import make_cfg, make_batch


@pytest.mark.skipif(len(jax.devices()) < 2, reason='needs multiple devices')
@pytest.mark.skipif(os.environ.get('B2M_SLOW_TESTS') != '1',
                    reason='~4 min on the 1-core virtual mesh; a strict '
                           'subset of test_trainer_multidevice_epoch (and '
                           'the driver dryrun) — run per round via '
                           'scripts/run_slow_suite.sh')
def test_shard_map_train_step_runs_and_syncs():
    cfg = make_cfg(extra=('--vox_bucket', '256', '--seg_bucket', '32'))
    D = 2
    dev_batches = []
    for d in range(D):
        b, _ = make_batch(cfg, seeds=(10 + d,), n_inst=3, ppi=150)
        dev_batches.append({k: np.asarray(v) for k, v in b.items()})
    stacked = collate_device_batches(dev_batches)
    stacked = {k: jnp.asarray(v) for k, v in stacked.items()}

    mesh = M.make_mesh(D)
    model = S.build_model(cfg, num_classes=20, axis_name=M.AXIS)
    tx = S.make_optimizer(cfg)
    sample = {k: jnp.asarray(v[0]) for k, v in stacked.items()}
    # init without axis (single-device init of the same module tree)
    init_model = S.build_model(cfg, num_classes=20, axis_name=None)
    state = S.init_state(cfg, init_model, tx, sample)

    step = M.make_parallel_train_step(cfg, model, tx, mesh)
    losses = []
    for i in range(2):
        state, ld = step(state, stacked, jnp.float32(1e-3),
                         jnp.float32(1.0), jnp.float32(0.0))
        loss = float(ld['optimization_loss'])
        assert np.isfinite(loss)
        losses.append(loss)
    assert losses[-1] < losses[0]
    # params identical across devices (pmean'd grads): replicated output
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_collate_device_batches_shapes_and_sentinels():
    cfg = make_cfg(extra=('--vox_bucket', '128', '--seg_bucket', '16'))
    b1, _ = make_batch(cfg, seeds=(1,), n_inst=2, ppi=100)
    b2, _ = make_batch(cfg, seeds=(2,), n_inst=6, ppi=300)
    b1 = {k: np.asarray(v) for k, v in b1.items()}
    b2 = {k: np.asarray(v) for k, v in b2.items()}
    st = collate_device_batches([b1, b2])
    assert st['vox_features'].shape[0] == 2
    V0 = st['coords0'].shape[1]
    # smaller batch's sentinels rewritten to the common pad size
    m = st['nmap3_0'][0]
    assert m.max() <= V0
    n1 = int(b1['num0'])
    assert (m[n1:] == V0).all()
    # valid voxel data preserved
    np.testing.assert_array_equal(st['vox_features'][0][:n1],
                                  b1['vox_features'][:n1])
