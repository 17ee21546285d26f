"""Scene readers against synthetic on-disk datasets (PLY/json/npy fixtures)."""

import json
import os

import numpy as np
import pytest

from box2mask_tpu.config import get_config
from box2mask_tpu.datasets import ply as plyio


def make_box_mesh(center, half, n_sub=3):
    """Simple triangulated cube mesh."""
    c, h = np.asarray(center), np.asarray(half)
    corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                        for z in (-1, 1)]) * h + c
    faces = []
    quads = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 3, 7, 5)]
    for a, b, cc, d in quads:
        faces.append([a, b, cc])
        faces.append([a, cc, d])
    return corners, np.array(faces)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(50, 3))
    col = rng.uniform(size=(50, 3))
    p = tmp_path / 'pts.ply'
    plyio.write_ply_points(str(p), pos, col)
    pos2, col2, faces = plyio.read_mesh(str(p))
    np.testing.assert_allclose(pos2, pos, atol=1e-5)
    np.testing.assert_allclose(col2, col, atol=1 / 255.0 + 1e-6)
    assert faces is None

    v, f = make_box_mesh((0, 0, 0), (1, 1, 1))
    pm = tmp_path / 'mesh.ply'
    plyio.write_ply_mesh(str(pm), v, f, np.ones((8, 3)) * 0.5)
    v2, c2, f2 = plyio.read_mesh(str(pm))
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_vertex_normals_cube():
    v, f = make_box_mesh((0, 0, 0), (1, 1, 1))
    n = plyio.compute_vertex_normals(v, f)
    assert n.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)


@pytest.fixture
def scannet_dir(tmp_path):
    """Fake ScanNet data_dir with one scene."""
    rng = np.random.default_rng(0)
    scans = tmp_path / 'scans' / 'scene0000_00'
    scans.mkdir(parents=True)
    # two boxes as "instances" + a floor strip
    v1, f1 = make_box_mesh((1, 1, 0.5), (0.4, 0.4, 0.5))
    v2, f2 = make_box_mesh((3, 2, 0.3), (0.3, 0.5, 0.3))
    floor = np.stack([rng.uniform(0, 4, 200), rng.uniform(0, 4, 200),
                      np.zeros(200)], 1)
    ftris = np.stack([np.arange(0, 198), np.arange(1, 199),
                      np.arange(2, 200)], 1)
    verts = np.concatenate([v1, v2, floor])
    faces = np.concatenate([f1, f2 + 8, ftris + 16])
    colors = rng.uniform(size=(len(verts), 3))
    plyio.write_ply_mesh(str(scans / 'scene0000_00_vh_clean_2.ply'),
                         verts, faces, colors)
    segments = np.concatenate([np.zeros(8), np.ones(8),
                               np.full(200, 2)]).astype(int)
    seg_json = {'segIndices': segments.tolist()}
    with open(scans / '..' / '..' / 'dummy', 'w') as f:
        f.write('')
    with open(tmp_path / 'scans' / 'scene0000_00' /
              'scene0000_00_vh_clean_2.0.010000.segs.json', 'w') as f:
        json.dump(seg_json, f)
    agg = {'segGroups': [
        {'label': 'chair', 'segments': [0]},
        {'label': 'table', 'segments': [1]},
        {'label': 'floor', 'segments': [2]},
    ]}
    with open(scans / 'scene0000_00.aggregation.json', 'w') as f:
        json.dump(agg, f)
    with open(scans / 'scene0000_00.txt', 'w') as f:
        f.write('axisAlignment = ' + ' '.join(
            str(v) for v in np.eye(4).reshape(-1)) + '\n')
    tsv = tmp_path / 'scannetv2-labels.combined.tsv'
    with open(tsv, 'w') as f:
        f.write('id\traw_category\tcategory\tcount\tnyu40id\n')
        f.write('1\tchair\tchair\t10\t5\n')
        f.write('2\ttable\ttable\t10\t7\n')
        f.write('3\tfloor\tfloor\t10\t2\n')
    return tmp_path


def test_scannet_process_scene(scannet_dir):
    from box2mask_tpu.datasets import scannet
    cfg = get_config(['--data_dir', str(scannet_dir), '--align',
                      '--network_heads', 'mlp_offsets'])
    scene, labels = scannet.process_scene('scene0000_00', 'train', cfg)
    assert scene['positions'].shape == scene['normals'].shape
    # all segments annotated -> ids 1..3 densely re-ranked to 0..2
    assert len(np.unique(labels['instances'])) == 3
    assert set(np.unique(labels['semantics'])) == {2, 5, 7}
    # instance boxes: chair box half-extent ~0.4/0.4/0.5
    chair_inst = labels['instances'][0]
    b = labels['per_instance_bb_bounds'][chair_inst]
    np.testing.assert_allclose(b, [0.4, 0.4, 0.5], atol=1e-4)
    # seg2inst consistency
    assert labels['seg2inst'][0] == labels['instances'][0]
    # foreground excludes floor
    assert scannet.is_foreground(np.array([5, 7, 2, 1, 22])).tolist() == \
        [True, True, False, False, False]


def test_scannet_augmented_read(scannet_dir):
    from box2mask_tpu.datasets import scannet
    np.random.seed(3)
    cfg = get_config(['--data_dir', str(scannet_dir), '--augmentation',
                      '--rotation_90_aug', '--apply_hue_aug',
                      '--scaling_aug', '1.0', '0.8', '1.2',
                      '--flipping_aug', '0.5',
                      '--network_heads', 'mlp_offsets'])
    scene, labels = scannet.process_scene('scene0000_00', 'train', cfg,
                                          do_augmentations=True)
    assert np.isfinite(scene['positions']).all()
    # hue aug output is normalized (mean-centered), not [0,1]
    assert scene['colors'].min() < 0


@pytest.fixture
def s3dis_dir(tmp_path):
    rng = np.random.default_rng(1)
    area = tmp_path / 'Area_5'
    area.mkdir()
    n = 400
    pos = rng.uniform(0, 3, (n, 3))
    rgb = rng.uniform(0, 255, (n, 3))
    normals = rng.normal(size=(n, 3))
    sem = rng.integers(0, 13, n)
    inst = np.zeros(n)
    inst[:200] = 0
    inst[200:] = 1
    sem[:200] = 8   # chair
    sem[200:] = 2   # wall
    data = np.concatenate([pos, rgb, normals, sem[:, None], inst[:, None]], 1)
    np.save(area / 'office_1.normals.instance.npy', data)
    segdir = tmp_path / 'segment_labels' / \
        'learned_superpoint_graph_segmentations'
    segdir.mkdir(parents=True)
    segments = np.repeat(np.arange(8), 50)
    info = {'segments': segments,
            'per_point_segment_instanceID': inst.astype(np.int32),
            'per_point_segment_semanticID': sem.astype(np.int32),
            'seg2instanceID': np.array([0, 0, 0, 0, 1, 1, 1, 1]),
            'seg2semanticID': np.array([8, 8, 8, 8, 2, 2, 2, 2])}
    np.save(segdir / 'Area_5.office_1.npy', np.array(info, dtype=object))
    return tmp_path


def test_s3dis_process_scene(s3dis_dir):
    from box2mask_tpu.datasets import s3dis
    cfg = get_config(['--data_dir', str(s3dis_dir), '--dataset_name', 's3dis',
                      '--s3dis_split_fold', '5',
                      '--network_heads', 'mlp_offsets'])
    names = s3dis.get_scene_names('val', cfg)
    assert names == ['Area_5.office_1']
    assert s3dis.get_scene_names('train', cfg) == []
    scene, labels = s3dis.process_scene('Area_5.office_1', 'val', cfg)
    assert len(scene['positions']) == 400
    assert labels['per_instance_bb_bounds'].shape == (2, 3)
    assert labels['seg2inst'].tolist() == [0, 0, 0, 0, 1, 1, 1, 1]


@pytest.fixture
def arkit_dir(tmp_path):
    rng = np.random.default_rng(2)
    tr = tmp_path / '3dod' / 'Training' / '40000001'
    tr.mkdir(parents=True)
    v, f = make_box_mesh((1, 1, 0.4), (0.4, 0.3, 0.4))
    floor = np.stack([rng.uniform(0, 3, 300), rng.uniform(0, 3, 300),
                      np.zeros(300)], 1)
    ftris = np.stack([np.arange(0, 298), np.arange(1, 299),
                      np.arange(2, 300)], 1)
    verts = np.concatenate([v, floor])
    faces = np.concatenate([f, ftris + 8])
    plyio.write_ply_mesh(str(tr / '40000001_3dod_mesh.ply'), verts, faces,
                         rng.uniform(size=(len(verts), 3)))
    ann = {'data': [{'label': 'chair', 'segments': {'obbAligned': {
        'normalizedAxes': np.eye(3).reshape(-1).tolist(),
        'centroid': [1, 1, 0.4], 'axesLengths': [0.8, 0.6, 0.8]}}}],
        'stats': {}}
    with open(tr / '40000001_3dod_annotation.json', 'w') as f2:
        json.dump(ann, f2)
    segdir = tmp_path / '3dod' / 'segmented_train_clean'
    segdir.mkdir()
    segments = np.concatenate([np.zeros(8), np.ones(300)]).astype(int)
    with open(segdir / '40000001_3dod_mesh.0.010000.segs.json', 'w') as f2:
        json.dump({'segIndices': segments.tolist()}, f2)
    return tmp_path


def test_arkit_process_scene(arkit_dir):
    from box2mask_tpu.datasets import arkitscenes
    cfg = get_config(['--data_dir', str(arkit_dir), '--dataset_name',
                      'arkitscenes', '--network_heads', 'mlp_offsets'])
    scene, labels = arkitscenes.process_scene('40000001', 'train', cfg,
                                              subsample_rate=1)
    assert len(scene['positions']) == 308
    assert labels['per_instance_semantics'].tolist() == [5]
    np.testing.assert_allclose(labels['per_instance_bb_bounds'][0],
                               [0.4, 0.3, 0.4], atol=1e-6)
    # recentering: min z is 0 relative... z-min removed
    assert abs(scene['positions'][:, 2].min()) < 1e-9
    # box center shifted consistently with the points: the box must still
    # contain its mesh points
    from box2mask_tpu.datasets.association import obb_occupancy
    occ = obb_occupancy(scene['positions'][:8],
                        labels['per_instance_bb_centers'],
                        labels['per_instance_bb_bounds'] + 1e-6,
                        labels['per_instance_bb_rotations'])
    assert occ.all()
