"""Weak-label association: vectorized implementation vs a slow loop oracle that
follows the reference rules literally (models/dataloader.py:203-314)."""

import numpy as np
import pytest

from box2mask_tpu.config import get_config
from box2mask_tpu.datasets import association as A
from box2mask_tpu.datasets import synthetic


def slow_scannet_association(labels, scene, cfg, unique_segs):
    """Reference-semantics oracle (naive loops)."""
    sem = labels['per_instance_semantics']
    scene_fg = (sem > 2) & (sem != 22)
    centers = labels['per_instance_bb_centers'][scene_fg]
    bounds = labels['per_instance_bb_bounds'][scene_fg] + 0.005
    mn, mx = centers - bounds, centers + bounds
    ids = labels['unique_instances'][scene_fg]
    P = len(scene['positions'])
    occ = A.aabb_occupancy(scene['positions'], mn, mx)
    num = occ.sum(0)
    vol = np.prod(2 * bounds, 1)

    inst_ps = np.full(len(unique_segs), -2, np.int64)
    inst_pp = np.full(P, -2, np.int64)
    for i, seg_id in enumerate(unique_segs):
        m = scene['segments'] == seg_id
        if not m.any():
            continue
        counts = num[m]
        mn_c = counts.min()
        if mn_c == 1:
            pt = np.where(m)[0][np.where(counts == 1)[0][0]]
            bb = np.argwhere(occ[:, pt]).reshape(-1)[0]
            inst_ps[i] = ids[bb]
            inst_pp[m] = ids[bb]
        elif mn_c == 0:
            inst_ps[i] = -1
            inst_pp[m] = -1
    if cfg.smallest_bb_heuristic:
        for i in np.where(inst_ps == -2)[0]:
            m = scene['segments'] == unique_segs[i]
            if not m.any():
                continue
            counts = num[m]
            pt = np.where(m)[0][counts.argmin()]
            boxes = np.argwhere(occ[:, pt]).reshape(-1)
            if len(boxes) == 0:
                continue
            best = boxes[np.argmin(vol[boxes])]
            inst_ps[i] = ids[best]
            inst_pp[m] = ids[best]
    return inst_pp, inst_ps


@pytest.mark.parametrize('smallest_bb', [False, True])
def test_scannet_association_matches_oracle(smallest_bb):
    args = ['--network_heads', 'mlp_offsets', '--bb_supervision',
            '--do_segment_pooling']
    if smallest_bb:
        args.append('--smallest_bb_heuristic')
    cfg = get_config(args)
    for seed in range(3):
        scene, labels = synthetic.make_scene(seed=seed, num_instances=6,
                                             points_per_instance=200,
                                             floor_points=500, wall_points=300)
        unique_segs = np.unique(scene['segments'])
        got_pp, got_ps, _ = A.associate_scannet(labels, scene, cfg, unique_segs)
        want_pp, want_ps = slow_scannet_association(labels, scene, cfg,
                                                    unique_segs)
        np.testing.assert_array_equal(got_ps, want_ps)
        np.testing.assert_array_equal(got_pp, want_pp)


def test_dropout_and_noisy_boxes_deterministic():
    cfg = get_config(['--network_heads', 'mlp_offsets', '--bb_supervision',
                      '--do_segment_pooling', '--dropout_boxes', '0.5'])
    scene, labels = synthetic.make_scene(seed=1, num_instances=8)
    segs = np.unique(scene['segments'])
    a1 = A.associate_scannet(labels, scene, cfg, segs)
    a2 = A.associate_scannet(labels, scene, cfg, segs)
    np.testing.assert_array_equal(a1[1], a2[1])   # per-scene seed => identical
    cfgn = get_config(['--network_heads', 'mlp_offsets', '--bb_supervision',
                       '--do_segment_pooling', '--noisy_boxes', '0.04',
                       '--majority_vote'])
    b1 = A.associate_scannet(labels, scene, cfgn, segs)
    b2 = A.associate_scannet(labels, scene, cfgn, segs)
    np.testing.assert_array_equal(b1[1], b2[1])
    assert b1[2] is not None     # noisy boxes returned for visualization


def test_point_association_mode():
    cfg = get_config(['--network_heads', 'mlp_offsets', '--bb_supervision',
                      '--point_association'])
    scene, labels = synthetic.make_scene(seed=2, num_instances=4)
    pp, ps, _ = A.associate_scannet(labels, scene, cfg, None)
    assert ps is None
    assert set(np.unique(pp)).issubset(
        set(labels['unique_instances']) | {-1, -2})
