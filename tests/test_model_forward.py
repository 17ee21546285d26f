"""End-to-end forward/loss/grad smoke on synthetic scenes (CPU).

Mirrors the reference's debug strategy (--overfit_to_single_scene,
models/dataloader.py:41-46): a tiny scene must produce finite losses that decrease
under a few Adam steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2mask_tpu.config import get_config
from box2mask_tpu.datasets import synthetic, supervision
from box2mask_tpu.datasets.voxelize import voxelize_scene
from box2mask_tpu.datasets.batching import build_batch
from box2mask_tpu.engine import state as S
from box2mask_tpu.datasets.tables import get_tables
from box2mask_tpu.nn.unet import SelectionNet
from box2mask_tpu.nn import losses as L


def make_cfg(extra=()):
    return get_config([
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1',
        '--voxel_size', '0.05', '--vox_bucket', '512', '--seg_bucket', '64',
        '--layers', '1', *extra])


def make_batch(cfg, seeds=(0, 1), n_inst=5, ppi=300):
    valid_ids, sem_id2idx, _, _ = get_tables('scannet')
    rets = []
    for s in seeds:
        scene, labels = synthetic.make_scene(
            seed=s, num_instances=n_inst, points_per_instance=ppi,
            floor_points=1200, wall_points=800)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
        rets.append(ret)
    # host-maps layout: these tests exercise the network; the device-maps
    # path has dedicated tests (test_device_maps.py)
    dev, host = build_batch(rets, cfg, sem_id2idx, device_maps=False)
    return {k: jnp.asarray(v) for k, v in dev.items()}, host


@pytest.fixture(scope='module')
def setup():
    cfg = make_cfg()
    batch, host = make_batch(cfg)
    model = SelectionNet(num_classes=20, heads=tuple(cfg.network_heads),
                         layers=cfg.layers, compute_dtype=jnp.float32)
    variables = S.init_variables(model, batch)
    return cfg, batch, host, model, variables


def test_forward_shapes_and_finiteness(setup):
    cfg, batch, host, model, variables = setup
    out, mutated = model.apply(variables, batch, train=True,
                               mutable=['batch_stats'])
    S = batch['seg_valid'].shape[0]
    assert out['mlp_offsets'].shape == (S, 3)
    assert out['mlp_bounds'].shape == (S, 3)
    assert out['mlp_bb_scores'].shape == (S, 1)
    assert out['mlp_semantics'].shape == (S, 20)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # batch stats actually updated
    leaf = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaf)


def test_eval_mode_uses_running_stats(setup):
    cfg, batch, host, model, variables = setup
    out1 = model.apply(variables, batch, train=False)
    out2 = model.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out1['mlp_offsets']),
                                  np.asarray(out2['mlp_offsets']))


def test_losses_finite_and_decrease(setup):
    cfg, batch, host, model, variables = setup
    import optax
    tx = optax.adam(1e-3)

    params = variables['params']
    stats = variables['batch_stats']
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            out, mut = model.apply({'params': p, 'batch_stats': stats}, batch,
                                   train=True, mutable=['batch_stats'])
            ld = L.compute_losses(cfg, out, batch, jnp.float32(1.0),
                                  jnp.float32(0.0))
            return ld['optimization_loss'], (ld, mut['batch_stats'])
        (loss, (ld, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, ld

    first = None
    for i in range(5):
        params, stats, opt_state, ld = step(params, stats, opt_state)
        loss = float(ld['optimization_loss'])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert loss < first, (first, loss)
    for k in ('offset_loss', 'bounds_loss', 'bb_score_loss', 'semantics_loss',
              'semantics_acc', 'semantics_mIoU', 'bb_scores_correlation'):
        assert k in ld


def test_supervision_labels_sane(setup):
    cfg, batch, host, model, variables = setup
    fg = np.asarray(batch['fg_instances'])
    sv = np.asarray(batch['seg_valid'])
    assert fg[~sv].sum() == 0
    assert 0 < fg.sum() <= sv.sum()
    gt_idx = np.asarray(batch['gt_semantics_idx'])
    assert ((gt_idx >= -100) & (gt_idx < 20)).all()
    # fg segments must have strictly positive box bounds
    bnd = np.asarray(batch['gt_bb_bounds'])
    assert (bnd[fg] > 0).all()


@pytest.mark.skipif(__import__('os').environ.get('B2M_SLOW_TESTS') != '1',
                    reason='two full train-step compiles; '
                           'scripts/run_slow_suite.py')
def test_remat_matches_plain(setup):
    """--remat (block rematerialization, nn/unet.py) must be a pure
    memory/compute trade: identical parameter tree, identical loss, grads
    equal up to f32 recompute reassociation. This is what lets bs=8
    ScanNet-scale training fit one 16 GB chip (DESIGN.md round 4)."""
    cfg, batch, host, model, variables = setup
    cfg_r = make_cfg(['--remat'])
    model_r = SelectionNet(num_classes=20, heads=tuple(cfg.network_heads),
                           layers=cfg.layers, compute_dtype=jnp.float32,
                           remat=True)
    tx = S.make_optimizer(cfg)
    s0 = S.init_state(cfg, model, tx, batch)
    s1 = S.init_state(cfg_r, model_r, tx, batch)
    for (p, a), (q, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.params),
            jax.tree_util.tree_leaves_with_path(s1.params)):
        assert str(p) == str(q)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lr, one = jnp.float32(1e-3), jnp.float32(1.0)
    step0 = S.make_train_step(cfg, model, tx, donate=False)
    step1 = S.make_train_step(cfg_r, model_r, tx, donate=False)
    n0, ld0 = step0(s0, batch, lr, one, one)
    n1, ld1 = step1(s1, batch, lr, one, one)
    np.testing.assert_allclose(float(ld0['optimization_loss']),
                               float(ld1['optimization_loss']), rtol=1e-5)
    # post-step params agree (Adam on near-identical grads)
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(n0.params),
            jax.tree_util.tree_leaves_with_path(n1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5), str(p)

    # selective remat (--remat_levels 1: only the shallow wide levels
    # recompute) is the same pure trade
    model_s = SelectionNet(num_classes=20, heads=tuple(cfg.network_heads),
                           layers=cfg.layers, compute_dtype=jnp.float32,
                           remat=True, remat_max_level=1)
    s2 = S.init_state(cfg_r, model_s, tx, batch)
    step2 = S.make_train_step(cfg_r, model_s, tx, donate=False)
    n2, ld2 = step2(s2, batch, lr, one, one)
    np.testing.assert_allclose(float(ld0['optimization_loss']),
                               float(ld2['optimization_loss']), rtol=1e-5)
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(n0.params),
            jax.tree_util.tree_leaves_with_path(n2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5), str(p)
