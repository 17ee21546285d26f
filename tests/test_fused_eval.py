"""The fused product inference path (engine/infer.py) must produce the SAME
results and AP as the legacy per-batch + host-oracle path.

This is the round-3 verdict #1 guarantee: `evaluate.py` and `bench.py` drive
the identical FusedInferencePipeline, and its output equals the reference
protocol path (host NumPy detection_to_masks) scene for scene. Because the
fused path runs at --eval_batch_size 4 and the legacy path at batch size 1,
this also proves AP is exactly batch-size invariant (per-scene windows inside
the jit; eval-mode BN uses running stats)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from box2mask_tpu.config import get_config
from box2mask_tpu.datasets.loader import get_dataset
from box2mask_tpu.engine.evaluate import Evaluater


def _cfg(tmp_path, extra=()):
    os.environ['BOX2MASK_EXP_ROOT'] = str(tmp_path)
    return get_config([
        '--dataset_name', 'synthetic',
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1',
        '--voxel_size', '0.05', '--vox_bucket', '512', '--seg_bucket', '64',
        '--eval_ths', '0.5', '0.05', '0.3', '0.6',
        '--dataset_size', '4', '--fixed_seed', '10', '--layers', '1',
        '--synthetic_instances', '5', '--synthetic_points_per_instance', '250',
        '--synthetic_floor_points', '900', '--synthetic_wall_points', '700',
        '--exp_name', 'test_fused_eval'] + list(extra))


@pytest.fixture()
def fused_env(monkeypatch):
    monkeypatch.setenv('B2M_FUSED_EVAL', '1')


def test_fused_eval_matches_host_oracle(tmp_path, monkeypatch):
    cfg = _cfg(tmp_path)
    ds = get_dataset(cfg, 'val', do_augmentations=False)

    monkeypatch.setenv('B2M_FUSED_EVAL', '1')
    ev_fused = Evaluater(cfg)
    results_fused, entries = ev_fused.fused_dataset_results(ds, cache=False)
    assert len(results_fused) == 4

    monkeypatch.setenv('B2M_FUSED_EVAL', '0')
    ev_legacy = Evaluater(cfg)
    legacy_entries = ev_legacy.dataset_prediction(ds, batch_size=1,
                                                  cache=False)
    results_legacy = ev_legacy.pred_entries_to_results(legacy_entries)

    assert set(results_fused) == set(results_legacy)
    for name in results_legacy:
        r, g = results_legacy[name], results_fused[name]
        assert len(r['conf']) == len(g['conf']), name
        ro = np.argsort(-np.asarray(r['conf']), kind='stable')
        go = np.argsort(-np.asarray(g['conf']), kind='stable')
        np.testing.assert_allclose(np.asarray(r['conf'])[ro],
                                   np.asarray(g['conf'])[go], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(r['label_id'])[ro],
                                      np.asarray(g['label_id'])[go])
        np.testing.assert_array_equal(np.asarray(r['mask'])[ro],
                                      np.asarray(g['mask'])[go])

    # the official AP protocol agrees too (same GT derivation on both)
    from box2mask_tpu.metrics import scannet_ap
    gt = ev_fused.gt_ids_for_entries(entries)
    a_f, _, _ = scannet_ap.evaluate_scannet(results_fused, gt)
    a_l, _, _ = scannet_ap.evaluate_scannet(results_legacy, gt)
    for k in ('all_ap', 'all_ap_50%', 'all_ap_25%'):
        np.testing.assert_allclose(a_f[k], a_l[k], rtol=0)  # nan-aware


def test_fused_readback_carries_per_vox_semantics(tmp_path, monkeypatch):
    """With the per-vox semantics head configured, the stacked readback
    ships a u8 `vox_sem` plane equal to the legacy path's argmax over the
    raw head — what s3dis_eval_fused consumes (round-4 verdict #4)."""
    cfg = _cfg(tmp_path, ['--network_heads', 'mlp_offsets', 'mlp_bounds',
                          'mlp_bb_scores', 'mlp_semantics',
                          'mlp_per_vox_semantics',
                          '--loss_weight_per_vox_semantics', '1',
                          '--dataset_size', '2'])
    ds = get_dataset(cfg, 'val', do_augmentations=False)
    monkeypatch.setenv('B2M_FUSED_EVAL', '1')
    ev = Evaluater(cfg)
    _, entries = ev.fused_dataset_results(ds, cache=False)
    assert ev._vox_sem, 'vox_sem plane missing from the stacked readback'

    monkeypatch.setenv('B2M_FUSED_EVAL', '0')
    ev_l = Evaluater(cfg)
    legacy = ev_l.dataset_prediction(ds, batch_size=1, cache=False)
    for pred, dev, host in legacy:
        for si, scene in enumerate(host['scene']):
            nvox = int(np.asarray(dev['batch0'] == si).sum())
            want = np.argmax(
                np.asarray(pred[cfg.mlp_per_vox_semantics]), 1)[
                np.asarray(dev['batch0']) == si]
            got = ev._vox_sem[scene['name']][:nvox]
            np.testing.assert_array_equal(got, want)


def test_s3dis_fused_entry_matches_protocol_core(tmp_path):
    """s3dis_eval_fused must feed _s3dis_protocol exactly the per-scene
    (pred_sem, masks) the legacy path would: vox_sem[vox2point] with the
    result-dict masks."""
    rng = np.random.default_rng(3)
    n_pts, n_vox = 600, 200
    cfg = _cfg(tmp_path)
    ev = Evaluater.__new__(Evaluater)          # no model needed
    ev.cfg = cfg
    pos = rng.normal(size=(n_pts, 3)).astype(np.float32)
    pos[:, 2] = np.abs(pos[:, 2])
    nrm = np.zeros((n_pts, 3), np.float32)
    nrm[:, 2] = 1.0
    labels = {'semantics': rng.integers(0, 13, n_pts),
              'instances': rng.integers(1, 5, n_pts)}
    scene = {'name': 'fake_room', 'positions': pos, 'normals': nrm}
    vox2point = rng.integers(0, n_vox, n_pts)
    host = {'scene': [scene], 'labels': [labels], 'vox2point': [vox2point]}
    vox_sem = rng.integers(0, 13, n_vox).astype(np.uint8)
    masks = rng.random((3, n_pts)) > 0.7
    results = {'fake_room': {'conf': np.ones(3, np.float32),
                             'label_id': np.ones(3, np.int32),
                             'mask': masks}}
    ev._vox_sem = {'fake_room': vox_sem}
    got = ev.s3dis_eval_fused(results, [(None, None, host)])
    want = ev._s3dis_protocol([
        (scene, labels, vox_sem.astype(np.int64)[vox2point], masks,
         'fake_room')])
    np.testing.assert_allclose(got['mPrecision'], want['mPrecision'])
    np.testing.assert_allclose(got['mRecall'], want['mRecall'])


def test_fused_eval_cache_roundtrip(tmp_path, monkeypatch):
    """Second call reuses the cached compact readbacks and returns identical
    results (the cache stores stacked out_np dicts, not raw head outputs)."""
    cfg = _cfg(tmp_path, ['--dataset_size', '2'])
    ds = get_dataset(cfg, 'val', do_augmentations=False)
    monkeypatch.setenv('B2M_FUSED_EVAL', '1')
    ev = Evaluater(cfg)
    r1, _ = ev.fused_dataset_results(ds, cache=True)
    ev2 = Evaluater(cfg)
    r2, _ = ev2.fused_dataset_results(ds, cache=True)
    assert set(r1) == set(r2)
    for name in r1:
        np.testing.assert_array_equal(np.asarray(r1[name]['mask']),
                                      np.asarray(r2[name]['mask']))
        np.testing.assert_allclose(np.asarray(r1[name]['conf']),
                                   np.asarray(r2[name]['conf']), rtol=0)
