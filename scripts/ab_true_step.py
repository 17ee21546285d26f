#!/usr/bin/env python
"""Trust-hardened bs=8 train-step rate: forces the execution chain.

Two tunnel measurement hazards can corrupt a donated-step timing loop
(DESIGN.md round-3 trust notes, re-confirmed round 5):

  1. executor memoization: repeated (executable, same-buffer args) may be
     served from an execution cache — donation makes state buffers ping-pong
     between two handle sets, so steps 3.. can repeat handles;
  2. donated-output block_until_ready: the output aliases the INPUT buffer,
     which already exists on device, so blocking on it may not wait for the
     queued execution over the tunnel.

This probe defeats both: every step gets a UNIQUE learning rate (args never
repeat -> no memoization) and the clock stops on a value fetch of the LAST
step's loss scalar — ld[i] depends on state[i-1] which depends on every
prior step, so the fetch forces the whole chain regardless of how blocking
behaves on aliased buffers.

Cases: device-only (2 preloaded batches) and upload-in-loop (the
bench_train methodology), at the bench bucket; optionally remat off.

Run: python scripts/ab_true_step.py [bs] [n_steps] [remat: 1|0] [bucket]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REMAT = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
BUCKET = int(sys.argv[4]) if len(sys.argv) > 4 else 131072


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

    cfg = bench.make_cfg()
    cfg.vox_bucket = BUCKET
    cfg.remat = REMAT
    _, sem_id2idx, _, _ = get_tables('scannet')

    def make_ret(i):
        scene, labels = synthetic.make_scene(
            seed=1000 + i, num_instances=18, points_per_instance=4000,
            floor_points=45000, wall_points=35000, segs_per_instance=6)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
        return ret

    rets = [make_ret(i) for i in range(2 * BS)]
    dev_np = [build_batch(rets[i * BS:(i + 1) * BS], cfg, sem_id2idx,
                          mode='train')[0] for i in range(2)]
    pad = np.asarray(dev_np[0]['keys0_b']).shape[1]
    print(f'bs={BS} remat={REMAT} pad={pad} rows={BS * pad} '
          f'valid={int(dev_np[0]["num0"])}', flush=True)

    tx = S.make_optimizer(cfg)
    model = S.build_model(cfg, num_classes=20)
    uploader = BatchUploader()

    def wire_mb(d):
        return sum(np.asarray(v).nbytes for v in d.values()) / 1e6

    print(f'raw batch MB={wire_mb(dev_np[0]):.1f}', flush=True)

    for tag, preload in (('device-only', True), ('upload-in-loop', False)):
        try:
            state = S.init_state(cfg, model, tx, uploader(dev_np[0]))
            step = S.make_train_step(cfg, model, tx)
            one = jnp.float32(1.0)
            if preload:
                dev_j = [{k: jnp.asarray(v) for k, v in d.items()}
                         for d in dev_np]
                feed = lambda i: dev_j[i % 2]
            else:
                feed = lambda i: uploader(dev_np[i % 2])
            ld = None
            for i in range(2):                        # compile + warm
                state, ld = step(state, feed(i), jnp.float32(1e-3 + i * 1e-9),
                                 one, one)
            float(ld['optimization_loss'])            # fence the warm-up
            t0 = time.perf_counter()
            marks = []
            for i in range(N_STEPS):
                state, ld = step(state, feed(i),
                                 jnp.float32(1e-3 + (i + 2) * 1e-9), one, one)
                marks.append(time.perf_counter() - t0)
            loss = float(ld['optimization_loss'])     # forces the chain
            dt = time.perf_counter() - t0
            disp = ' '.join(f'{m:.2f}' for m in marks)
            print(f'{tag:<16} {dt / N_STEPS * 1e3:8.1f} ms/step '
                  f'{N_STEPS * BS / dt:6.2f} scenes/sec  loss={loss:.3f}\n'
                  f'    dispatch marks: {disp}', flush=True)
        except Exception as e:
            print(f'{tag:<16} FAILED {type(e).__name__}: '
                  f'{str(e)[:200]}'.replace(chr(10), ' '), flush=True)


if __name__ == '__main__':
    main()
