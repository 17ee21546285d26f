#!/usr/bin/env python
"""Decompose the bs=8 train step: upload-overlap and remat/bucket A/Bs.

Rows measured (all on the real donated train step, programs cache-shared
with bench.bench_train):

  device-only:   2 batches PRE-uploaded to HBM, alternate them — the pure
                 device step rate (upload excluded). The gap to the
                 bench_train row is what the per-step packed upload costs
                 AFTER its supposed overlap with async device compute — over
                 a ~30 MB/s tunnel a ~12 MB bs=8 train wire is ~0.4 s/step,
                 which only disappears if the transfer truly overlaps.
  upload+step:   bench_train's loop (pack + device_put + step per step).
  tight bucket:  same rows at vox_bucket shrunk to the batch's actual max
                 scene rows (128-aligned) — measures what per-batch bucket
                 fitting buys (fewer padded rows = less conv work AND less
                 activation memory).
  tight+noremat: the tight bucket WITHOUT block remat, if it fits — the
                 re-forward is ~1/3 of the remat step's conv wall.

Run: python scripts/ab_train_step.py [bs] [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    from box2mask_tpu import runtime
    runtime.setup()
    import copy
    import jax
    import jax.numpy as jnp
    import bench
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.engine.hostload import BatchUploader
    from box2mask_tpu.datasets import synthetic, supervision
    from box2mask_tpu.datasets.voxelize import voxelize_scene
    from box2mask_tpu.datasets.batching import build_batch
    from box2mask_tpu.datasets.tables import get_tables
    from box2mask_tpu.config import needs_remat

    cfg = bench.make_cfg()
    _, sem_id2idx, _, _ = get_tables('scannet')

    def make_ret(i, c):
        scene, labels = synthetic.make_scene(
            seed=1000 + i, num_instances=18, points_per_instance=4000,
            floor_points=45000, wall_points=35000, segs_per_instance=6)
        ret = voxelize_scene(scene, c)
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, c, 'scannet')
        return ret

    def build(c):
        rets = [make_ret(i, c) for i in range(2 * BS)]
        return [build_batch(rets[i * BS:(i + 1) * BS], c, sem_id2idx,
                            mode='train')[0] for i in range(2)]

    tx = S.make_optimizer(cfg)

    def run_case(tag, c, dev_np, remat, preload):
        c = copy.copy(c)
        c.remat = remat
        try:
            model = S.build_model(c, num_classes=20)
            uploader = BatchUploader()
            state = S.init_state(c, model, tx, uploader(dev_np[0]))
            step = S.make_train_step(c, model, tx)
            lr, one = jnp.float32(1e-3), jnp.float32(1.0)
            if preload:
                dev_j = [{k: jnp.asarray(v) for k, v in d.items()}
                         for d in dev_np]
                feed = lambda i: dev_j[i % 2]
            else:
                feed = lambda i: uploader(dev_np[i % 2])
            for i in range(2):
                state, _ = step(state, feed(i), lr, one, one)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                   state.params)
            t0 = time.perf_counter()
            for i in range(N_STEPS):
                state, _ = step(state, feed(i), lr, one, one)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                   state.params)
            dt = time.perf_counter() - t0
            print(f'{tag:<28} {dt / N_STEPS * 1e3:8.1f} ms/step '
                  f'{N_STEPS * BS / dt:6.2f} scenes/sec', flush=True)
        except Exception as e:
            print(f'{tag:<28} FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}'.replace(chr(10), ' '), flush=True)

    dev_np = build(cfg)
    pad = np.asarray(dev_np[0]['keys0_b']).shape[1]
    print(f'bs={BS} bucket pad={pad} rows={BS * pad} '
          f'valid={int(dev_np[0]["num0"])}', flush=True)
    run_case('bucket131k remat dev-only', cfg, dev_np, True, True)
    run_case('bucket131k remat upload', cfg, dev_np, True, False)

    # tight bucket: the largest actual scene rows, 128-aligned, applied at
    # voxelize/batch-build time like a per-batch bucket fit would
    scene_rows = []
    for d in dev_np:
        keys = np.asarray(d['keys0_b'])
        from box2mask_tpu.sparse.device_maps import SENT_KEY
        scene_rows += [int((k < SENT_KEY).sum()) for k in keys]
    tight = int(np.ceil(max(scene_rows) / 128) * 128)
    cfg_t = copy.copy(cfg)
    cfg_t.vox_bucket = tight
    dev_t = build(cfg_t)
    pad_t = np.asarray(dev_t[0]['keys0_b']).shape[1]
    print(f'tight bucket pad={pad_t} rows={BS * pad_t} '
          f'(needs_remat={needs_remat(BS * pad_t)})', flush=True)
    run_case('tight remat upload', cfg_t, dev_t, True, False)
    run_case('tight NOREMAT dev-only', cfg_t, dev_t, False, True)
    run_case('tight NOREMAT upload', cfg_t, dev_t, False, False)


if __name__ == '__main__':
    main()
