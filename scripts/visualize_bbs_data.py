#!/usr/bin/env python
"""Viewer for the released noisy/dropout bounding-box npy data (reference
data/augmented_BBs/visualize_bbs_data.py): exports a wireframe point cloud of
the boxes colored by semantic class.

Expected npy layout per scene: dict with 'min_corners', 'max_corners',
'semantic_ids' (or an (N, 7) array [min, max, sem])."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from box2mask_tpu.datasets.ply import write_ply_points  # noqa: E402
from box2mask_tpu.viz.export import semantic_colors  # noqa: E402


def box_wire_points(bb_min, bb_max, pts_per_edge=24):
    """Dense points along the 12 box edges."""
    corners = np.array([[x, y, z] for x in (bb_min[0], bb_max[0])
                        for y in (bb_min[1], bb_max[1])
                        for z in (bb_min[2], bb_max[2])])
    edges = [(0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6), (3, 7),
             (4, 5), (4, 6), (5, 7), (6, 7)]
    t = np.linspace(0, 1, pts_per_edge)[:, None]
    return np.concatenate([corners[a] + t * (corners[b] - corners[a])
                           for a, b in edges])


def main():
    p = argparse.ArgumentParser()
    p.add_argument('npy', help='boxes npy')
    p.add_argument('--out', default=None)
    a = p.parse_args()
    data = np.load(a.npy, allow_pickle=True)
    if data.dtype == object:
        d = data.item()
        mins, maxs = np.asarray(d['min_corners']), np.asarray(d['max_corners'])
        sems = np.asarray(d.get('semantic_ids', np.zeros(len(mins))))
    else:
        mins, maxs, sems = data[:, :3], data[:, 3:6], data[:, 6].astype(int)
    pts, cols = [], []
    for i in range(len(mins)):
        w = box_wire_points(mins[i], maxs[i])
        pts.append(w)
        cols.append(np.tile(semantic_colors([int(sems[i])])[0], (len(w), 1)))
    out = a.out or os.path.splitext(a.npy)[0] + '_boxes.ply'
    write_ply_points(out, np.concatenate(pts), np.concatenate(cols))
    print(f'{len(mins)} boxes -> {out}')


if __name__ == '__main__':
    main()
