"""ARKitScenes detection eval path: mask -> convex-hull prism -> OBB VOC AP."""

import numpy as np

from box2mask_tpu.config import get_config
from box2mask_tpu.engine.evaluate import Evaluater


def make_entries():
    rng = np.random.default_rng(0)
    # one scene, two box instances; points fill the boxes exactly
    centers = np.array([[1.0, 1.0, 0.5], [4.0, 2.0, 0.4]])
    bounds = np.array([[0.5, 0.4, 0.5], [0.3, 0.6, 0.4]])
    rots = np.stack([np.eye(3).reshape(9), np.eye(3).reshape(9)])
    pts, masks = [], []
    n = 400
    for i in range(2):
        p = centers[i] + rng.uniform(-1, 1, (n, 3)) * bounds[i]
        pts.append(p)
    positions = np.concatenate(pts)
    m1 = np.zeros(2 * n, bool)
    m1[:n] = True
    m2 = ~m1
    scene = {'name': '40000099', 'positions': positions,
             'colors': np.ones_like(positions) * 0.5,
             'normals': np.zeros_like(positions)}
    labels = {'per_instance_bb_centers': centers,
              'per_instance_bb_bounds': bounds,
              'per_instance_bb_rotations': rots,
              'per_instance_semantics': np.array([5, 7]),
              'unique_instances': np.arange(2)}
    host = {'scene': [scene], 'labels': [labels]}
    results = {'40000099': {'conf': np.array([0.9, 0.8]),
                            'label_id': np.array([5, 7]),
                            'mask': np.stack([m1, m2])}}
    entries = [(None, None, host)]
    return results, entries


def test_arkit_eval_perfect_predictions():
    cfg = get_config(['--dataset_name', 'arkitscenes',
                      '--network_heads', 'mlp_offsets', 'mlp_bounds',
                      'mlp_bb_scores', 'mlp_semantics',
                      '--loss_weight_bb_bounds', '1',
                      '--loss_weight_bb_scores', '1',
                      '--loss_weight_semantics', '1'])
    ev = Evaluater.__new__(Evaluater)   # skip model construction
    ev.cfg = cfg
    results, entries = make_entries()
    mAP = Evaluater.arkitscenes_eval(ev, results, entries)
    assert mAP > 0.99


def test_arkit_eval_wrong_class_fails():
    cfg = get_config(['--dataset_name', 'arkitscenes',
                      '--network_heads', 'mlp_offsets', 'mlp_bounds',
                      'mlp_bb_scores', 'mlp_semantics',
                      '--loss_weight_bb_bounds', '1',
                      '--loss_weight_bb_scores', '1',
                      '--loss_weight_semantics', '1'])
    ev = Evaluater.__new__(Evaluater)
    ev.cfg = cfg
    results, entries = make_entries()
    results['40000099']['label_id'] = np.array([7, 5])   # swapped classes
    mAP = Evaluater.arkitscenes_eval(ev, results, entries)
    assert mAP < 0.5
