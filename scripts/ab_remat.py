#!/usr/bin/env python
"""A/B the bs=8 train step across remat_levels on the real chip.

Round-4 verdict #2: bs=8 training reads 2.44 scenes/sec vs the reference's
effective ~5.4 (101h54m checkpoint, reference README.md:75). The round-4
remat is all-levels (remat_levels=7) — every BasicBlock re-forwards in the
backward. Activation bytes concentrate at the shallow wide levels (L0/L1
carry ~131k rows each vs ~2k at L6), and the no-remat step misses HBM by
only ~262 MB (DESIGN.md round 4), so rematting ONLY the shallow levels
should free enough memory at a fraction of the re-forward cost.

This sweep times the REAL donated train step (engine/state.make_train_step,
the trainer's path) + packed BatchUploader upload per step, exactly like
bench.bench_train, at bs=8 for each remat_levels in the sweep list. OOM
(RESOURCE_EXHAUSTED at compile or run) is recorded as 'oom', not a crash.

Methodology: 2 warm-up steps (compile + first exec), then n_steps timed
with one block_until_ready at the end; tunnel null-RTT printed for context.

Run: python scripts/ab_remat.py [bs] [n_steps] [levels...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
LEVELS = [int(v) for v in sys.argv[3:]] or [7, 2, 1, 0]


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
    print(f'bs={BS} batch voxels={int(dev_np[0]["num0"])}', flush=True)

    @jax.jit
    def null(x):
        return x + 1.0
    z = null(jnp.zeros((8, 128), jnp.float32))
    float(jnp.sum(z))
    t0 = time.perf_counter()
    float(jnp.sum(null(z)))
    print(f'null RTT {(time.perf_counter() - t0) * 1e3:.1f} ms', flush=True)

    tx = S.make_optimizer(cfg)
    for levels in LEVELS:
        cfg_r = copy.copy(cfg)
        cfg_r.remat = levels >= 0
        cfg_r.remat_levels = levels
        tag = f'remat<=L{levels}' if levels >= 0 else 'no-remat'
        uploader = BatchUploader()
        try:
            model = S.build_model(cfg_r, num_classes=20)
            state = S.init_state(cfg_r, model, tx, uploader(dev_np[0]))
            step = S.make_train_step(cfg_r, model, tx)
            lr, one = jnp.float32(1e-3), jnp.float32(1.0)
            t0 = time.perf_counter()
            for d in dev_np:
                state, _ = step(state, uploader(d), lr, one, one)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                   state.params)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(N_STEPS):
                state, _ = step(state, uploader(dev_np[i % 2]), lr, one, one)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                   state.params)
            dt = time.perf_counter() - t0
            print(f'{tag:<12} {dt / N_STEPS * 1e3:8.1f} ms/step '
                  f'{N_STEPS * BS / dt:6.2f} scenes/sec '
                  f'(compile+warm {compile_s:.0f}s)', flush=True)
        except Exception as e:
            msg = str(e)[:200].replace(chr(10), ' ')
            print(f'{tag:<12} FAILED {type(e).__name__}: {msg}', flush=True)
        del uploader


if __name__ == '__main__':
    main()
