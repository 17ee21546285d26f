#!/usr/bin/env python
"""Per-segment random-color visualization of an oversegmented mesh (the
reference's pyviz3d viewer, dataprocessing/oversegmentation/visualize_segments.py,
as a colored-PLY exporter)."""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from box2mask_tpu.datasets.ply import read_mesh, write_ply_points  # noqa: E402
from box2mask_tpu.viz.export import instance_colors  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ply', help='mesh .ply')
    p.add_argument('segs_json', help='matching .segs.json')
    p.add_argument('--out', default=None)
    a = p.parse_args()
    pos, _, _ = read_mesh(a.ply)
    with open(a.segs_json) as f:
        segs = np.asarray(json.load(f)['segIndices'])
    out = a.out or (os.path.splitext(a.ply)[0] + '_segments.ply')
    write_ply_points(out, pos, instance_colors(segs))
    print(f'{len(np.unique(segs))} segments -> {out}')


if __name__ == '__main__':
    main()
