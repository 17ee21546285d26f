"""Voxelization + NN feature assignment + segment pooling geometry (host, NumPy).

Behavior-parity with the reference's per-scene voxelization
(models/dataloader.py:61-123) but fully vectorized — the reference uses an sklearn
ball-tree 1-NN and a Python loop over segments; we use a cKDTree (exact 1-NN, same
result) and bincount segment reductions.

Key naming follows the reference batch contract (SURVEY.md §2.4):
  vox2point: (P,) point -> voxel row (np.unique inverse); projects voxel data to
             points via fancy indexing `arr[vox2point]`... NOTE the reference calls
             this 'vox2point' although it is indexed by point; we keep the name for
             drop-in parity.
  point2vox: (V,) voxel row -> index of its nearest scene point ("NN voxelization",
             preserves sharp instance boundaries).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def voxelize_scene(scene, cfg, with_segments=None):
    """Voxelize one scene dict {positions, colors, normals, segments} -> ret dict."""
    if with_segments is None:
        with_segments = cfg.do_segment_pooling
    ret = {}
    positions = scene['positions']
    origin = min(0, np.min(positions)) if len(positions) else 0.0
    input_coords = (positions - origin) / cfg.voxel_size

    native = None
    if getattr(cfg, 'use_native_host_ops', True):
        from box2mask_tpu.native import native_voxelize
        native = native_voxelize(input_coords)
    if native is not None:
        vox_coords, vox2point, point2vox = native
        ret['vox_coords'] = vox_coords
        ret['vox2point'] = vox2point
        ret['point2vox'] = point2vox
    else:
        vox = np.round(input_coords)
        # unique voxels, sorted lexicographically (np.unique(axis=0) order)
        vox_coords, vox2point = np.unique(vox, axis=0, return_inverse=True)
        vox2point = vox2point.reshape(-1)
        ret['vox_coords'] = vox_coords.astype(np.int32)
        ret['vox2point'] = vox2point
        # NN voxelization: each voxel carries its nearest point's features
        tree = cKDTree(input_coords)
        _, point2vox = tree.query(vox_coords.astype(np.float64), k=1)
        point2vox = np.asarray(point2vox).reshape(-1)
        ret['point2vox'] = point2vox
    vox_coords = ret['vox_coords']
    vox2point = ret['vox2point']
    point2vox = ret['point2vox']

    feats = [scene['colors']]
    if cfg.use_normals_input:
        feats.append(scene['normals'])
    feats = np.concatenate(feats, axis=1)
    ret['vox_features'] = feats[point2vox].astype(np.float32)
    ret['vox_world_coords'] = (vox_coords * cfg.voxel_size + origin).astype(np.float32)
    ret['scene'] = scene

    if with_segments:
        ret['vox_segments'] = scene['segments'][point2vox]
        unique_segs, seg2vox = np.unique(ret['vox_segments'], return_inverse=True)
        seg2vox = seg2vox.reshape(-1)
        S = len(unique_segs)
        # per-segment mean world position (reference's python loop,
        # dataloader.py:110-123, vectorized via bincount)
        cnt = np.bincount(seg2vox, minlength=S).astype(np.float64)
        mids = np.stack([
            np.bincount(seg2vox, weights=ret['vox_world_coords'][:, d], minlength=S)
            for d in range(3)], axis=1) / cnt[:, None]
        assert not np.any(np.isnan(mids))
        ret['unique_vox_segments'] = unique_segs
        ret['seg2vox'] = seg2vox
        ret['seg2point'] = seg2vox[vox2point]
        ret['input_location'] = mids.astype(np.float32)
        ret['pred2point'] = ret['seg2point']
    else:
        ret['input_location'] = ret['vox_world_coords']
        ret['pred2point'] = vox2point
        ret['vox_segments'] = scene.get(
            'segments', np.zeros(len(positions), np.int32))[point2vox]
    return ret


def segment_mode(values, seg2x, num_segments, minlength=None):
    """Per-segment mode (majority vote) of integer `values`, vectorized.

    Used for the majority-vote association variants (models/dataloader.py:263-271)
    and per-segment semantic voting. Ties resolve to the smallest value (same as
    scipy.stats.mode)."""
    values = np.asarray(values)
    vmin = values.min() if len(values) else 0
    shifted = values - vmin
    R = int(shifted.max()) + 1 if len(shifted) else 1
    combo = seg2x.astype(np.int64) * R + shifted
    counts = np.bincount(combo, minlength=num_segments * R).reshape(num_segments, R)
    return counts.argmax(axis=1) + vmin
