"""--bf16_acts mixed-precision policy (round 5).

Params, BN statistics, losses and head outputs stay f32; inter-op
activations (conv outputs, BN outputs, skips, head hiddens) narrow to bf16.
This halves the stored-activation footprint of the training backward, which
is what lets the bs=8 ScanNet-scale step run WITHOUT block remat on one
16 GB chip (config.needs_remat bf16 branch; the reference trains the same
config in f32 torch on a 48 GB GPU, reference README.md:102-103).

These tests pin the contract: numerics stay close to the f32 model, the
train step still optimizes, and the remat policy widens exactly 2x.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2mask_tpu.config import get_config, needs_remat
from box2mask_tpu.datasets import synthetic, supervision
from box2mask_tpu.datasets.voxelize import voxelize_scene
from box2mask_tpu.datasets.batching import build_batch
from box2mask_tpu.datasets.tables import get_tables
from box2mask_tpu.engine import state as S


def make_cfg(extra=()):
    return get_config([
        '--dataset_name', 'synthetic',
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1',
        '--voxel_size', '0.05', '--vox_bucket', '2048', '--seg_bucket', '128',
        '--layers', '1', '--exp_name', 'bf16t', *extra])


@pytest.fixture(scope='module')
def batch():
    cfg = make_cfg()
    _, sem_id2idx, _, _ = get_tables('scannet')
    scene, labels = synthetic.make_scene(
        seed=7, num_instances=4, points_per_instance=500,
        floor_points=2000, wall_points=1500, segs_per_instance=4)
    ret = voxelize_scene(scene, cfg)
    ret['labels'] = labels
    supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
    dev, _ = build_batch([ret], cfg, sem_id2idx, mode='train')
    return {k: jnp.asarray(v) for k, v in dev.items()}


def _one_step(cfg, batch, n=2):
    model = S.build_model(cfg, num_classes=20)
    tx = S.make_optimizer(cfg)
    state = S.init_state(cfg, model, tx, batch)
    step = S.make_train_step(cfg, model, tx, donate=False)
    p0 = state.params
    lds = []
    for _ in range(n):
        state, ld = step(state, batch, jnp.float32(1e-3),
                         jnp.float32(1.0), jnp.float32(1.0))
        lds.append(float(ld['optimization_loss']))
    return state, p0, lds


def test_bf16_acts_loss_close_to_f32_and_optimizes(batch):
    cfg32, cfg16 = make_cfg(), make_cfg(['--bf16_acts'])
    assert not cfg32.bf16_acts and cfg16.bf16_acts
    st32, _, l32 = _one_step(cfg32, batch)
    st16, p0, l16 = _one_step(cfg16, batch)
    assert all(np.isfinite(l16)), l16
    # same init seed, same data: first-step losses within bf16 rounding
    assert abs(l32[0] - l16[0]) / abs(l32[0]) < 0.05, (l32[0], l16[0])
    # the step actually moves parameters
    moved = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        jax.tree_util.tree_map(lambda a, b: a - b, st16.params, p0), 0.0)
    assert moved > 0
    # param/stat trees identical across the policy (checkpoints interchange)
    s32 = jax.tree_util.tree_structure(st32.params)
    s16 = jax.tree_util.tree_structure(st16.params)
    assert s32 == s16
    for a, b in zip(jax.tree_util.tree_leaves(st32.params),
                    jax.tree_util.tree_leaves(st16.params)):
        assert a.dtype == b.dtype == jnp.float32


def test_bf16_acts_forward_close_to_f32(batch):
    cfg32, cfg16 = make_cfg(), make_cfg(['--bf16_acts'])
    outs = {}
    for tag, cfg in (('f32', cfg32), ('bf16', cfg16)):
        model = S.build_model(cfg, num_classes=20)
        variables = S.init_variables(model, batch)
        fwd = S.make_forward(cfg, model)   # ensure_maps like the product path
        outs[tag] = fwd(variables['params'], variables['batch_stats'], batch)
    for head in outs['f32']:
        a = np.asarray(outs['f32'][head], np.float32)
        b = np.asarray(outs['bf16'][head], np.float32)
        # head outputs are f32 in BOTH policies
        assert outs['bf16'][head].dtype == jnp.float32
        scale = np.abs(a).mean() + 1e-3
        assert np.abs(a - b).mean() / scale < 0.1, head


def test_needs_remat_bf16_branch():
    # f32: 8 scenes x 131072 rows needs remat (262 MB over, DESIGN.md r4)
    assert needs_remat(8 * 131072)
    assert not needs_remat(4 * 131072)
    # bf16 halves stored activations: 8 x 131072 measured to fit (round 5)
    assert not needs_remat(8 * 131072, bf16_acts=True)
    assert needs_remat(9 * 131072, bf16_acts=True)


def test_auto_remat_respects_bf16():
    big = ['--batch_size', '8', '--vox_bucket', '131072']
    assert make_cfg(big).remat           # f32 auto-remat fires
    assert not make_cfg(big + ['--bf16_acts']).remat
