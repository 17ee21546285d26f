#!/usr/bin/env python
"""Offline S3DIS preparation: raw Stanford txt rooms ->
``data/s3dis/Area_X/<room>.normals.instance.npy``.

Behavior-parity with the reference's dataprocessing/prepare_s3dis.py: labels
are recovered by 1-NN matching each per-instance annotation cloud against the
room cloud; unannotated points inherit the nearest labeled point's labels;
instance ids are remapped to a contiguous 0..K-1 range. Output layout is
``[xyz, rgb, normals, semantic, instance]`` (N, 11).

Normals: the reference loads precomputed normals from ``<data>/normals/``;
this script does the same when present and otherwise estimates them from local
PCA over k-NN neighborhoods (no open3d dependency).
"""

import argparse
import glob
import os
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from box2mask_tpu.datasets.tables import S3DIS_CLASS_LABELS  # noqa: E402

NAME2ID = {n: i for i, n in enumerate(S3DIS_CLASS_LABELS)}
NAME2ID['bookcase'] = NAME2ID['bookshelf']


def estimate_normals(points, k=16):
    """Unit normals via local PCA (smallest eigenvector of the k-NN covariance)."""
    tree = cKDTree(points)
    _, nn = tree.query(points, k=k)
    nbrs = points[nn]                       # (N, k, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum('nki,nkj->nij', centered, centered) / k
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    return normals / np.maximum(norm, 1e-12)


def get_labels(scene_name, scene_pts, data_dir):
    area, name = scene_name.split('.', 1)
    paths = sorted(glob.glob(os.path.join(data_dir, area, name,
                                          'Annotations', '*.txt')))
    tree = cKDTree(scene_pts)
    instances = np.full(len(scene_pts), -1, np.int32)
    semantics = np.full(len(scene_pts), -1, np.int32)
    for instance_id, pth in enumerate(paths):
        class_name = os.path.basename(pth).split('_')[0]
        if class_name not in NAME2ID:
            class_name = 'clutter'          # e.g. 'stairs'
        sem_id = NAME2ID[class_name]
        inst_pts = np.loadtxt(pth)[:, :3]
        _, idx = tree.query(inst_pts, k=1)
        instances[idx] = instance_id
        semantics[idx] = sem_id

    decided = instances >= 0
    if (~decided).any():
        dtree = cKDTree(scene_pts[decided])
        _, nn = dtree.query(scene_pts[~decided], k=1)
        instances[~decided] = instances[decided][nn]
        semantics[~decided] = semantics[decided][nn]
    assert instances.min() >= 0 and semantics.min() >= 0

    uniq = np.unique(instances)
    remap = np.zeros(uniq.max() + 1, np.int32)
    remap[uniq] = np.arange(len(uniq))
    instances = remap[instances]
    return instances, semantics


def preprocess_s3dis(data_dir, out_dir, scene_id=None):
    scene_list = []
    for i in range(1, 7):
        for p in sorted(glob.glob(os.path.join(data_dir, f'Area_{i}', '*'))):
            if os.path.isdir(p):
                scene_list.append(f'Area_{i}.{os.path.basename(p)}')
    if scene_id is not None:
        scene_list = scene_list[scene_id:scene_id + 1]

    for scene_name in scene_list:
        area, name = scene_name.split('.', 1)
        save_dir = os.path.join(out_dir, area)
        os.makedirs(save_dir, exist_ok=True)
        out_path = os.path.join(save_dir, name + '.normals.instance.npy')
        scene_data = np.loadtxt(os.path.join(data_dir, area, name,
                                             name + '.txt'))
        instances, semantics = get_labels(scene_name, scene_data[:, :3],
                                          data_dir)
        normals_path = os.path.join(data_dir, 'normals', scene_name + '.npy')
        if os.path.exists(normals_path):
            normals = np.load(normals_path)
        else:
            normals = estimate_normals(scene_data[:, :3])
        data = np.concatenate(
            [scene_data[:, :6], normals,
             semantics[:, None].astype(np.float32),
             instances[:, None].astype(np.float32)], axis=1)
        np.save(out_path, data)
        print('saved', out_path)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', type=str,
                   default='./data/Stanford3dDataset_v1.2_Aligned_Version/')
    p.add_argument('--out_dir', type=str, default='data/s3dis/')
    p.add_argument('--scene_id', type=int, default=None)
    a = p.parse_args()
    preprocess_s3dis(a.data_dir, a.out_dir, a.scene_id)
