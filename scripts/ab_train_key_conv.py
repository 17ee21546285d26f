#!/usr/bin/env python
"""A/B at ScanNet scale on the real chip: --key_conv on (pallas custom-VJP
conv path, no neighbor maps) vs off (nmap gather-GEMM) for TRAINING.

Prints both loss trajectories (must match step-for-step — the backward is
exact, not approximate) and steps/sec. Round-3 gate for flipping the
--key_conv default to 'on' (round-2 review item #5).

Usage: python scripts/ab_train_key_conv.py [n_steps]
"""
import os
import sys
import time

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

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def make_cfg(key_conv):
    return get_config([
        '--dataset_name', 'synthetic',
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1',
        '--voxel_size', '0.02', '--vox_bucket', '131072',
        '--seg_bucket', '2048', '--key_conv', key_conv,
        '--exp_name', 'ab_train'])


def run(key_conv):
    cfg = make_cfg(key_conv)
    _, sem_id2idx, _, _ = get_tables('scannet')
    scene, labels = synthetic.make_scene(
        seed=1000, num_instances=18, points_per_instance=4000,
        floor_points=45000, wall_points=35000, segs_per_instance=6)
    ret = voxelize_scene(scene, cfg)
    ret['labels'] = labels
    supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
    dev, _ = build_batch([ret], cfg, sem_id2idx, mode='train')
    batch = {k: jnp.asarray(v) for k, v in dev.items()}
    model = S.build_model(cfg, num_classes=20)
    tx = S.make_optimizer(cfg)
    state = S.init_state(cfg, model, tx, batch)
    step = S.make_train_step(cfg, model, tx, donate=False)
    lr, one = jnp.float32(1e-3), jnp.float32(1.0)
    losses = []
    state, ld = step(state, batch, lr, one, one)     # compile + step 0
    losses.append(float(ld['optimization_loss']))
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, ld = step(state, batch, lr, one, one)
        losses.append(float(ld['optimization_loss']))
    el = (time.perf_counter() - t0) / N_STEPS
    return losses, el, int(dev['num0'])


def main():
    res = {}
    for kc in ('on', 'off'):
        losses, el, nvox = run(kc)
        res[kc] = (losses, el)
        print(f'key_conv={kc}: {nvox} voxels, {el*1e3:.0f} ms/step '
              f'({1/el:.2f} steps/sec)')
        print('  losses:', [round(v, 4) for v in losses])
    lon, loff = res['on'][0], res['off'][0]
    drift = max(abs(a - b) / max(abs(b), 1e-6) for a, b in zip(lon, loff))
    print(f'max relative loss drift on-vs-off: {drift:.2e}')
    print(f'speedup: {res["off"][1] / res["on"][1]:.2f}x')
    assert drift < 2e-2, 'trajectories diverged — custom VJP mismatch?'
    print('AB_TRAIN_KEY_CONV_OK')


if __name__ == '__main__':
    main()
