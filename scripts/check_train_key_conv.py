#!/usr/bin/env python
"""One real-TPU train step through the key_conv custom-VJP path (the CPU
test equivalent is gated slow: tests/test_device_maps.py
test_train_step_key_conv_path)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from box2mask_tpu import runtime

runtime.setup()

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from box2mask_tpu.config import get_config    # noqa: E402
from box2mask_tpu.datasets import synthetic, supervision  # noqa: E402
from box2mask_tpu.datasets.voxelize import voxelize_scene  # noqa: E402
from box2mask_tpu.datasets.batching import build_batch     # noqa: E402
from box2mask_tpu.datasets.tables import get_tables        # noqa: E402
from box2mask_tpu.engine import state as S    # noqa: E402


def main():
    cfg = get_config([
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1',
        '--voxel_size', '0.05', '--vox_bucket', '512', '--seg_bucket', '64',
        '--layers', '1', '--key_conv', 'on'])
    _, sem_id2idx, _, _ = get_tables('scannet')
    scene, labels = synthetic.make_scene(seed=5, num_instances=4,
                                         points_per_instance=200,
                                         floor_points=900, wall_points=600)
    ret = voxelize_scene(scene, cfg)
    ret['labels'] = labels
    supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
    dev, _ = build_batch([ret], cfg, sem_id2idx, mode='train',
                         device_maps=True)
    assert 'kc3_base0' in dev, 'key_conv plans missing (TPU backend needed)'
    batch = {k: jnp.asarray(v) for k, v in dev.items()}
    model = S.build_model(cfg, num_classes=20)
    tx = S.make_optimizer(cfg)
    state = S.init_state(cfg, model, tx, batch)
    step = S.make_train_step(cfg, model, tx, donate=False)
    lr, one = jnp.float32(1e-3), jnp.float32(1.0)
    losses = []
    for i in range(3):
        state, ld = step(state, batch, lr, one, one)
        losses.append(float(ld['optimization_loss']))
    print('losses', [round(v, 3) for v in losses])
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0], 'loss should decrease on repeated batch'
    print('TRAIN_KEY_CONV_OK')


if __name__ == '__main__':
    main()
