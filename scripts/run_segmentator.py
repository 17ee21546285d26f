#!/usr/bin/env python
"""Drive the C++ segmentator over all test scenes (reference
dataprocessing/oversegmentation/run_segmentator.py, argparse instead of absl)."""

import argparse
import os
import subprocess


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--scene_path', default='data/scannet/scans_test/')
    p.add_argument('--segments_path', default='data/scannet/scans_test_segmented')
    p.add_argument('--segmentator_path',
                   default=os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), 'cpp', 'segmentator',
                       'segmentator'))
    p.add_argument('--kthresh', default='0.01')
    p.add_argument('--seg_min_verts', default='20')
    a = p.parse_args()

    os.makedirs(a.segments_path, exist_ok=True)
    for scene_name in sorted(os.listdir(a.scene_path)):
        ply = os.path.join(a.scene_path, scene_name,
                           f'{scene_name}_vh_clean_2.ply')
        if not os.path.exists(ply):
            continue
        subprocess.run([a.segmentator_path, ply, a.kthresh, a.seg_min_verts,
                        a.segments_path], check=True)


if __name__ == '__main__':
    main()
