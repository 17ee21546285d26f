"""C++ oversegmentation CLI: build + run on a synthetic mesh."""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

from box2mask_tpu.datasets.ply import write_ply_mesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, 'cpp', 'segmentator')


@pytest.fixture(scope='module')
def binary():
    if shutil.which('g++') is None:
        pytest.skip('g++ not available')
    subprocess.run(['make'], cwd=SRC, check=True, capture_output=True)
    return os.path.join(SRC, 'segmentator')


def grid_plane(nx, ny, origin, axis_u, axis_v, z=0.0):
    """Triangulated grid plane; returns (verts, faces)."""
    us, vs = np.meshgrid(np.arange(nx), np.arange(ny), indexing='ij')
    verts = (origin + us[..., None] * 0.05 * np.asarray(axis_u)
             + vs[..., None] * 0.05 * np.asarray(axis_v)).reshape(-1, 3)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            faces.append([a, a + 1, a + ny])
            faces.append([a + 1, a + ny + 1, a + ny])
    return verts, np.array(faces)


def test_segmentator_separates_orthogonal_planes(binary, tmp_path):
    # floor plane + wall plane meeting at a right angle: the normal-based
    # edge weights must keep them in different segments
    v1, f1 = grid_plane(20, 20, np.array([0., 0., 0.]), [1, 0, 0], [0, 1, 0])
    v2, f2 = grid_plane(20, 20, np.array([0., 0., 0.]), [1, 0, 0], [0, 0, 1])
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    ply = tmp_path / 'scene0001_00.ply'
    write_ply_mesh(str(ply), verts, faces)
    out = subprocess.run([binary, str(ply), '0.01', '20', str(tmp_path)],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    seg_file = tmp_path / 'scene0001_00.0.010000.segs.json'
    assert seg_file.exists(), list(tmp_path.iterdir())
    data = json.loads(seg_file.read_text())
    segs = np.array(data['segIndices'])
    assert len(segs) == len(verts)
    assert data['params']['segMinVerts'] == 20
    floor_segs = set(segs[:len(v1)])
    wall_segs = set(segs[len(v1):])
    # interiors of the two planes must not share a segment
    interior_floor = {segs[5 * 20 + 10]}
    interior_wall = {segs[len(v1) + 5 * 20 + 10]}
    assert interior_floor.isdisjoint(interior_wall)
    # each plane interior is mostly one segment (smooth normals merge)
    vals, counts = np.unique(segs[:len(v1)], return_counts=True)
    assert counts.max() > 0.5 * len(v1)


def test_segmentator_min_verts_merging(binary, tmp_path):
    v, f = grid_plane(30, 30, np.array([0., 0., 0.]), [1, 0, 0], [0, 1, 0])
    ply = tmp_path / 'flat.ply'
    write_ply_mesh(str(ply), v, f)
    subprocess.run([binary, str(ply), '0.01', '20', str(tmp_path)],
                   check=True, capture_output=True)
    data = json.loads((tmp_path / 'flat.0.010000.segs.json').read_text())
    segs = np.array(data['segIndices'])
    vals, counts = np.unique(segs, return_counts=True)
    # a flat plane collapses to one big segment; no tiny fragments survive
    assert counts.max() == len(v)
