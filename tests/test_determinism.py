"""Fixed-seed determinism: the eval protocol relies on reproducible augmented
validation streams (reference evaluates WITH augmentations under --fixed_seed,
models/evaluation.py:672, README quick start)."""

import numpy as np

from box2mask_tpu.config import get_config, set_fixed_seed


def build_once(seed):
    cfg = get_config([
        '--dataset_name', 'synthetic', '--network_heads', 'mlp_offsets',
        '--do_segment_pooling', '--bb_supervision',
        '--voxel_size', '0.05', '--vox_bucket', '256', '--seg_bucket', '32',
        '--fixed_seed', str(seed), '--augmentation', '--rotation_90_aug',
        '--scaling_aug', '1.0', '0.8', '1.2', '--dataset_size', '2',
        '--num_workers', '4'])
    from box2mask_tpu.datasets.loader import get_dataset
    ds = get_dataset(cfg, 'val', do_augmentations=True)
    loader = ds.get_loader(shuffle=True, drop_last=False, batch_size=2)
    dev, host = next(iter(loader))
    return dev, host


def test_fixed_seed_reproduces_batches():
    d1, h1 = build_once(10)
    d2, h2 = build_once(10)
    np.testing.assert_array_equal(np.asarray(d1['keys0_b']),
                                  np.asarray(d2['keys0_b']))
    np.testing.assert_allclose(np.asarray(d1['vox_features']),
                               np.asarray(d2['vox_features']))
    np.testing.assert_array_equal(np.asarray(d1['gt_semantics']),
                                  np.asarray(d2['gt_semantics']))
    # different seed -> different stream (augmentations actually applied)
    d3, _ = build_once(11)
    assert (d1['keys0_b'].shape != d3['keys0_b'].shape
            or not np.array_equal(np.asarray(d1['keys0_b']),
                                  np.asarray(d3['keys0_b'])))
