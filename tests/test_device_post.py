"""On-device post-processing vs the host NumPy oracle (detection2mask).

Predictions are derived from GT so boxes/scores are crisp (no borderline
IoU/threshold ties between the f64 host path and the f32 device path)."""

import numpy as np
import jax.numpy as jnp

from box2mask_tpu.config import get_config
from box2mask_tpu.datasets import synthetic, supervision
from box2mask_tpu.datasets.voxelize import voxelize_scene
from box2mask_tpu.datasets.batching import build_batch
from box2mask_tpu.datasets.tables import get_tables
from box2mask_tpu.postprocess.detection2mask import detection_to_masks
from box2mask_tpu.postprocess.device_post import (make_device_postproc,
                                                  device_masks_to_results)


def _cfg():
    return get_config([
        '--dataset_name', 'synthetic',
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1',
        '--voxel_size', '0.05', '--vox_bucket', '512', '--seg_bucket', '64',
        '--eval_ths', '0.5', '0.05', '0.3', '0.6',
        '--exp_name', 'test_device_post'])


def _batch_and_pred(cfg, sem_id2idx, valid_ids, seeds=(3, 4)):
    rets = []
    for s in seeds:
        scene, labels = synthetic.make_scene(
            seed=s, num_instances=5, points_per_instance=250,
            floor_points=900, wall_points=700)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
        rets.append(ret)
    dev, host = build_batch(rets, cfg, sem_id2idx, mode='val')
    S_pad = dev['seg_valid'].shape[0]
    rng = np.random.RandomState(0)
    # crisp GT-derived predictions
    pred = {
        cfg.mlp_offsets: dev['gt_bb_offsets'].astype(np.float32),
        cfg.mlp_bounds: dev['gt_bb_bounds'].astype(np.float32),
        cfg.mlp_bb_scores: rng.uniform(-2, 4, (S_pad, 1)).astype(np.float32),
    }
    C = len(valid_ids)
    idx = np.array([list(valid_ids).index(s) if s in list(valid_ids) else 0
                    for s in dev['gt_semantics']])
    sem = np.full((S_pad, C), -10.0, np.float32)
    sem[np.arange(S_pad), idx] = 10.0
    pred[cfg.mlp_semantics] = sem
    return dev, host, pred


def test_device_postproc_matches_host_oracle():
    cfg = _cfg()
    valid_ids, sem_id2idx, _, is_fg = get_tables('scannet')
    dev, host, pred = _batch_and_pred(cfg, sem_id2idx, valid_ids)

    post = make_device_postproc(cfg, valid_ids, is_fg, max_masks=64)
    batch = {k: jnp.asarray(v) for k, v in dev.items()}
    predj = {k: jnp.asarray(v) for k, v in pred.items()}

    for si in range(len(host['scene'])):
        ref = detection_to_masks(pred, dev, host, cfg, valid_ids, is_fg,
                                 mode='eval', scene_idx=si)
        out = post(predj, batch, jnp.int32(si),
                   jnp.asarray(cfg.eval_ths, jnp.float32))
        out_np = {k: np.asarray(v) for k, v in out.items()}
        got = device_masks_to_results(out_np, dev, host, valid_ids, si)
        name = host['scene'][si]['name']
        r, g = ref[name], got[name]
        assert len(r['conf']) == len(g['conf']), (len(r['conf']),
                                                  len(g['conf']))
        np.testing.assert_allclose(np.sort(r['conf']), np.sort(g['conf']),
                                   rtol=1e-5)
        # same score order -> rows comparable after sorting both by conf
        ro = np.argsort(-r['conf'], kind='stable')
        go = np.argsort(-g['conf'], kind='stable')
        np.testing.assert_array_equal(r['label_id'][ro], g['label_id'][go])
        np.testing.assert_array_equal(r['mask'][ro], g['mask'][go])


def test_device_postproc_empty_scene():
    """A scene whose every segment is predicted background yields 0 masks."""
    cfg = _cfg()
    valid_ids, sem_id2idx, _, is_fg = get_tables('scannet')
    dev, host, pred = _batch_and_pred(cfg, sem_id2idx, valid_ids, seeds=(7,))
    C = len(valid_ids)
    sem = np.full(pred[cfg.mlp_semantics].shape, -10.0, np.float32)
    sem[:, 0] = 10.0          # class id 1 (wall) everywhere -> background
    pred[cfg.mlp_semantics] = sem

    post = make_device_postproc(cfg, valid_ids, is_fg, max_masks=64)
    out = post({k: jnp.asarray(v) for k, v in pred.items()},
               {k: jnp.asarray(v) for k, v in dev.items()},
               jnp.int32(0), jnp.asarray(cfg.eval_ths, jnp.float32))
    assert int(out['n_keep']) == 0
    got = device_masks_to_results({k: np.asarray(v) for k, v in out.items()},
                                  dev, host, valid_ids, 0)
    name = host['scene'][0]['name']
    assert got[name]['mask'].shape[0] == 0


def test_stacked_fused_matches_per_scene():
    """make_fused_infer's window-sliced, top_k-packed stacked output must
    equal the per-scene full-width postproc path, scene for scene."""
    import jax
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.postprocess.device_post import (
        make_fused_infer, stacked_masks_to_results)
    cfg = _cfg()
    valid_ids, sem_id2idx, _, is_fg = get_tables('scannet')

    from box2mask_tpu.datasets import synthetic as syn
    rets = []
    for s in (3, 4):
        scene, labels = syn.make_scene(
            seed=s, num_instances=5, points_per_instance=250,
            floor_points=900, wall_points=700)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
        rets.append(ret)
    dev, host = build_batch(rets, cfg, sem_id2idx, mode='val')
    batch = {k: jnp.asarray(v) for k, v in dev.items()}

    model = S.build_model(cfg, num_classes=20)
    variables = S.init_variables(model, batch)
    params, stats = variables['params'], variables['batch_stats']
    ths = jnp.asarray(cfg.eval_ths, jnp.float32)

    infer = make_fused_infer(cfg, model, valid_ids, is_fg, max_masks=64,
                             top_k=16)
    pred, out = infer(params, stats, batch, ths)
    out_np = jax.device_get(out)
    full = S.ensure_maps(batch)
    got = stacked_masks_to_results(
        out_np, dev, host, valid_ids, mode='eval',
        post_fallback=infer.post_full, pred=pred, dev_j=full, ths=ths)

    # reference: unfused per-scene full-width postproc on the same pred
    for si in range(len(host['scene'])):
        ref_out = infer.post_full(pred, full, jnp.int32(si), ths)
        ref = device_masks_to_results(
            {k: np.asarray(v) for k, v in ref_out.items()},
            dev, host, valid_ids, si)
        name = host['scene'][si]['name']
        np.testing.assert_allclose(ref[name]['conf'], got[name]['conf'],
                                   rtol=1e-6)
        np.testing.assert_array_equal(ref[name]['label_id'],
                                      got[name]['label_id'])
        np.testing.assert_array_equal(ref[name]['mask'], got[name]['mask'])


def test_cluster_cap_overflow_flag():
    """Degenerate predictions (every segment its own high-score cluster) must
    raise the cluster_cap_hit flag instead of silently dropping instances
    (VERDICT r2: reference loop is unbounded, models/iou_nms.py:84-100)."""
    import warnings as W
    cfg = _cfg()
    valid_ids, sem_id2idx, _, is_fg = get_tables('scannet')
    dev, host, pred = _batch_and_pred(cfg, sem_id2idx, valid_ids, seeds=(3,))
    S_pad = dev['seg_valid'].shape[0]
    n_seg = int(dev['num_segments'])
    # disjoint tiny boxes far apart -> every fg segment is its own cluster
    rng = np.random.RandomState(1)
    loc = dev['input_location']
    pred[cfg.mlp_offsets] = np.zeros((S_pad, 3), np.float32)
    pred[cfg.mlp_bounds] = np.full((S_pad, 3), 0.01, np.float32)
    pred[cfg.mlp_bb_scores] = np.full((S_pad, 1), 4.0, np.float32)
    # spread locations far apart so no clustering happens
    dev = dict(dev)
    dev['input_location'] = (np.arange(S_pad)[:, None]
                             * np.array([10.0, 0, 0])).astype(np.float32)

    cap = 8
    assert n_seg > cap
    post = make_device_postproc(cfg, valid_ids, is_fg, max_masks=cap)
    out = post({k: jnp.asarray(v) for k, v in pred.items()},
               {k: jnp.asarray(v) for k, v in dev.items()},
               jnp.int32(0), jnp.asarray(cfg.eval_ths, jnp.float32))
    assert bool(out['cluster_cap_hit'])
    with W.catch_warnings(record=True) as rec:
        W.simplefilter('always')
        device_masks_to_results({k: np.asarray(v) for k, v in out.items()},
                                dev, host, valid_ids, 0)
    assert any('max_masks' in str(w.message) for w in rec)
