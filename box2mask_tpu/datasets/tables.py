"""Per-dataset class-id tables (NumPy; no torch).

Value-parity with the reference tables — these ids define the label encoding of the
datasets and the network's class-index spaces:
  * ScanNet: dataprocessing/scannet.py:109-136 (20 semantic / 18 instance classes,
    NYU40 ids, foreground = sem>2 & sem!=22),
  * ARKitScenes: dataprocessing/arkitscenes.py:136-160 (28 classes incl.
    stove/washer/oven/dishwasher/fireplace/stool/tv_monitor),
  * S3DIS: dataprocessing/s3dis.py:21-51,79-86 (13 classes 0..12, foreground
    depends on --ignore_wall_ceiling_floor).
"""

from __future__ import annotations

import numpy as np

IGNORE = -100


def _id2idx(valid_ids, size):
    t = np.full(size, IGNORE, dtype=np.int64)
    t[valid_ids] = np.arange(len(valid_ids))
    return t


# --------------------------------------------------------------------------- ScanNet
SCANNET_SEMANTIC_CLASS_LABELS = [
    'wall', 'floor', 'cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
    'bookshelf', 'picture', 'counter', 'desk', 'curtain', 'refrigerator',
    'shower curtain', 'toilet', 'sink', 'bathtub', 'otherfurniture']
SCANNET_INSTANCE_CLASS_LABELS = SCANNET_SEMANTIC_CLASS_LABELS[2:]

SCANNET_SEMANTIC_VALID_CLASS_IDS = np.array(
    [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39])
SCANNET_INSTANCE_VALID_CLASS_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39])
SCANNET_SEMANTIC_ID2IDX = _id2idx(SCANNET_SEMANTIC_VALID_CLASS_IDS, 41)
SCANNET_INSTANCE_ID2IDX = _id2idx(SCANNET_INSTANCE_VALID_CLASS_IDS, 41)

# NYU40 color map used by all visualizations (scannet benchmark colors)
SCANNET_COLOR_MAP = np.array([
    (0, 0, 0), (174, 199, 232), (152, 223, 138), (31, 119, 180), (255, 187, 120),
    (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40), (197, 176, 213),
    (148, 103, 189), (196, 156, 148), (23, 190, 207), (178, 76, 76), (247, 182, 210),
    (66, 188, 102), (219, 219, 141), (140, 57, 197), (202, 185, 52), (51, 176, 203),
    (200, 54, 131), (92, 193, 61), (78, 71, 183), (172, 114, 82), (255, 127, 14),
    (91, 163, 138), (153, 98, 156), (140, 153, 101), (158, 218, 229), (100, 125, 154),
    (178, 127, 135), (120, 185, 128), (146, 111, 194), (44, 160, 44), (112, 128, 144),
    (96, 207, 209), (227, 119, 194), (213, 92, 176), (94, 106, 211), (82, 84, 163),
    (100, 85, 144)], dtype=np.float64)


def scannet_is_foreground(sem):
    """sem>2 excludes unlabeled/wall/floor; 22 is the (unused) ceiling id
    (reference dataprocessing/scannet.py:135-136)."""
    return (np.asarray(sem) > 2) & (np.asarray(sem) != 22)


# ----------------------------------------------------------------------- ARKitScenes
ARKITSCENES_SEMANTIC_CLASS_LABELS = [
    'wall', 'floor', 'cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
    'bookshelf', 'picture', 'counter', 'desk', 'shelf', 'curtain', 'stove', 'washer',
    'oven', 'dishwasher', 'fireplace', 'stool', 'refrigerator', 'tv_monitor',
    'shower curtain', 'toilet', 'sink', 'bathtub', 'otherfurniture']
ARKITSCENES_INSTANCE_CLASS_LABELS = ARKITSCENES_SEMANTIC_CLASS_LABELS[2:]

ARKITSCENES_SEMANTIC_VALID_CLASS_IDS = np.array(
    [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 15, 16, 18, 19, 20, 21, 22, 23, 24,
     25, 28, 33, 34, 36, 39])
ARKITSCENES_INSTANCE_VALID_CLASS_IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 15, 16, 18, 19, 20, 21, 22, 23, 24, 25, 28,
     33, 34, 36, 39])
ARKITSCENES_SEMANTIC_ID2IDX = _id2idx(ARKITSCENES_SEMANTIC_VALID_CLASS_IDS, 41)
ARKITSCENES_INSTANCE_ID2IDX = _id2idx(ARKITSCENES_INSTANCE_VALID_CLASS_IDS, 41)

# semantic id <-> annotation label name (OBB json annotations)
ARKITSCENES_NAME2ID = {
    'cabinet': 3, 'bed': 4, 'chair': 5, 'sofa': 6, 'table': 7, 'shelf': 15,
    'stove': 18, 'washer': 19, 'oven': 20, 'dishwasher': 21, 'fireplace': 22,
    'stool': 23, 'refrigerator': 24, 'tv_monitor': 25, 'toilet': 33, 'sink': 34,
    'bathtub': 36}
ARKITSCENES_ID2NAME = {v: k for k, v in ARKITSCENES_NAME2ID.items()}


def arkitscenes_is_foreground(sem):
    """ARKit has no ceiling class; fg = everything above wall/floor
    (reference models/dataloader.py:495)."""
    return np.asarray(sem) > 2


# ----------------------------------------------------------------------------- S3DIS
S3DIS_CLASS_LABELS = ['ceiling', 'floor', 'wall', 'beam', 'column', 'window', 'door',
                      'table', 'chair', 'sofa', 'bookshelf', 'board', 'clutter']
S3DIS_SEMANTIC_VALID_CLASS_IDS = np.arange(13)
S3DIS_INSTANCE_VALID_CLASS_IDS = np.arange(13)
S3DIS_SEMANTIC_ID2IDX = _id2idx(S3DIS_SEMANTIC_VALID_CLASS_IDS, 300)
S3DIS_INSTANCE_ID2IDX = _id2idx(S3DIS_INSTANCE_VALID_CLASS_IDS, 13)


def s3dis_foreground_mask(sem, cfg=None):
    """Reference dataprocessing/s3dis.py:79-83."""
    sem = np.asarray(sem)
    if cfg is not None and getattr(cfg, 'ignore_wall_ceiling_floor', False):
        return sem > 2
    return sem >= 0


def s3dis_is_foreground(sem):
    return np.asarray(sem) > 2


def get_tables(dataset_name):
    """(valid_ids, sem_id2idx, inst_id2idx, is_foreground) per dataset — the tuple
    threaded into Model in the reference (models/training.py:299-345)."""
    if dataset_name == 'scannet':
        return (SCANNET_SEMANTIC_VALID_CLASS_IDS, SCANNET_SEMANTIC_ID2IDX,
                SCANNET_INSTANCE_ID2IDX, scannet_is_foreground)
    if dataset_name == 'arkitscenes':
        return (ARKITSCENES_SEMANTIC_VALID_CLASS_IDS, ARKITSCENES_SEMANTIC_ID2IDX,
                ARKITSCENES_INSTANCE_ID2IDX, arkitscenes_is_foreground)
    if dataset_name == 's3dis':
        return (S3DIS_SEMANTIC_VALID_CLASS_IDS, S3DIS_SEMANTIC_ID2IDX,
                S3DIS_INSTANCE_ID2IDX, s3dis_is_foreground)
    raise ValueError(dataset_name)
