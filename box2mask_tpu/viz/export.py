"""Visualization producers: colored PLYs of predictions / GT + box dumps.

Behavior-parity with the reference's visualization writers
(models/evaluation.py:368-615): per scene writes rgb.ply, pred_instances.ply,
pred_semantics.ply, gt_instances.ply, gt_semantics.ply and bbs.npy into
<exp>/viz/<scene>/. Instance colors come from a deterministic random LUT
(utils/util.py:100-113); semantic colors from the dataset color map.
"""

from __future__ import annotations

import os

import numpy as np

from box2mask_tpu.datasets.ply import write_ply_points
from box2mask_tpu.datasets.tables import SCANNET_COLOR_MAP


def instance_colors(ids):
    """Deterministic random color per instance id; 0 black, -2 red."""
    ids = np.asarray(ids)
    out = np.zeros((len(ids), 3), np.float64)
    uniq = np.unique(ids)
    for u in uniq:
        rng = np.random.default_rng(abs(int(u)) + 7)
        if u == 0:
            c = np.zeros(3)
        elif u == -2:
            c = np.array([255.0, 0, 0])
        else:
            c = rng.uniform(0, 255, 3)
        out[ids == u] = c
    return out


def semantic_colors(sem_ids, color_map=None):
    cm = SCANNET_COLOR_MAP if color_map is None else color_map
    sem = np.clip(np.asarray(sem_ids), 0, len(cm) - 1)
    return cm[sem]


def masks_to_instance_ids(masks, confs):
    """Overlay masks by ascending confidence so the most confident wins."""
    if len(masks) == 0:
        return None
    n = np.asarray(masks[0]).shape[0]
    ids = np.zeros(n, np.int64)
    order = np.argsort(confs)
    for rank, j in enumerate(order):
        ids[np.asarray(masks[j]) > 0] = int(j) + 1
    return ids


def export_scene_visualization(out_dir, scene, labels, result, cfg=None):
    os.makedirs(out_dir, exist_ok=True)
    pos = scene['positions']
    if scene.get('colors') is not None:
        write_ply_points(os.path.join(out_dir, 'rgb.ply'), pos, scene['colors'])
    if labels is not None:
        write_ply_points(os.path.join(out_dir, 'gt_instances.ply'), pos,
                         instance_colors(labels['instances']))
        write_ply_points(os.path.join(out_dir, 'gt_semantics.ply'), pos,
                         semantic_colors(labels['semantics']))
    if result is not None:
        inst = masks_to_instance_ids(result['mask'], result['conf'])
        if inst is None or len(inst) != len(pos):
            # no surviving predictions: still write the files (all background)
            # so the visualization set is always complete
            inst = np.zeros(len(pos), np.int64)
        write_ply_points(os.path.join(out_dir, 'pred_instances.ply'), pos,
                         instance_colors(inst))
        sem = np.zeros(len(pos), np.int64)
        order = np.argsort(result['conf'])
        for j in order:
            mask = np.asarray(result['mask'][j]) > 0
            if len(mask) == len(pos):
                sem[mask] = int(result['label_id'][j])
        write_ply_points(os.path.join(out_dir, 'pred_semantics.ply'), pos,
                         semantic_colors(sem))
        if 'bbs' in result:
            np.save(os.path.join(out_dir, 'bbs.npy'),
                    np.asarray(result['bbs']))


def produce_visualizations(evaluater, dataset, cfg):
    """Reference --produce_visualizations / --predict_specific_scene flow
    (evaluation.py:523-615,711-715)."""
    entries = evaluater.load_or_predict(dataset)
    results = evaluater.pred_entries_to_results(entries)
    base = os.path.join(cfg.exp_path, 'viz')
    for _, _, host in entries:
        for scene, labels in zip(host['scene'], host['labels']):
            name = scene['name']
            if name not in results:
                continue
            export_scene_visualization(os.path.join(base, name), scene,
                                       labels, results[name], cfg)
            print(f'visualizations written: {os.path.join(base, name)}')
    return base
