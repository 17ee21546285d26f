"""S3DIS background instance assembly (walls/floor/ceiling are not voted —
protocol-parity with reference utils/s3dis_util.py:137-177):

  * ceiling (class 0) and floor (class 1) each form one instance per room,
  * walls (class 2) are clustered by DBSCAN(eps=.35, min_samples=10) over
    [coords, 2*normals]; clusters under 3000 points are suppressed,
  * per-proposal semantics = majority vote of per-point semantic predictions.
"""

from __future__ import annotations

import numpy as np


def assign_semantics_to_proposals(pred_semantics, proposal_masks):
    out = []
    for mask in proposal_masks:
        m = np.asarray(mask) > 0
        out.append(np.bincount(pred_semantics[m]).argmax() if m.any() else 0)
    return np.array(out)


def clustering_for_background(pred_semantics, coords, normals):
    from sklearn.cluster import DBSCAN
    pred_instances = np.zeros_like(pred_semantics, dtype=np.int32)
    pred_instances[pred_semantics == 0] = 1      # ceiling
    pred_instances[pred_semantics == 1] = 2      # floor

    wall = pred_semantics == 2
    if wall.sum() > 10:
        feats = np.concatenate([coords[wall], normals[wall] * 2], axis=1)
        labels = DBSCAN(eps=0.35, min_samples=10).fit(feats).labels_ + 4
        ids, cnts = np.unique(labels, return_counts=True)
        small = np.isin(labels, ids[cnts < 3000])
        labels[small] = -1
        pred_instances[wall] = labels
    return pred_instances
