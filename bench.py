#!/usr/bin/env python
"""Benchmark: ScanNet-scale inference throughput (scenes/sec/chip).

Measures the full per-scene inference pipeline on realistic ScanNet-val-scale
synthetic scenes (~100k voxels @ 2cm): host voxelization + coordinate-pyramid /
neighbor-map build (overlapped via a prefetch thread), jitted SelectionNet
forward on the chip, and vote->mask post-processing. Prints ONE JSON line; the
north-star target is >10 scenes/sec/chip (BASELINE.md).
"""

import json
import queue
import sys
import threading
import time

import numpy as np

N_SCENES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_WARMUP = 2
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def make_cfg():
    from box2mask_tpu.config import get_config
    return get_config([
        '--dataset_name', 'synthetic',
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1',
        '--voxel_size', '0.02',
        '--vox_bucket', '131072', '--seg_bucket', '2048',
        '--eval_ths', '0.5', '0.05', '0.3', '0.6',
        '--exp_name', 'bench'])


def scene_stream(cfg, n_batches, out_q):
    """Builds BATCH-scene batches; per-scene work parallelized in threads."""
    from concurrent.futures import ThreadPoolExecutor
    from box2mask_tpu.datasets import synthetic
    from box2mask_tpu.datasets.voxelize import voxelize_scene
    from box2mask_tpu.datasets.batching import build_batch
    from box2mask_tpu.datasets.tables import get_tables
    _, sem_id2idx, _, _ = get_tables('scannet')

    def make_ret(i):
        scene, labels = synthetic.make_scene(
            seed=1000 + i, num_instances=18, points_per_instance=4000,
            floor_points=45000, wall_points=35000, segs_per_instance=6)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        return ret
    try:
        with ThreadPoolExecutor(max_workers=4) as pool:
            for b in range(n_batches):
                rets = list(pool.map(make_ret,
                                     range(b * BATCH, (b + 1) * BATCH)))
                dev, host = build_batch(rets, cfg, sem_id2idx, mode='val')
                out_q.put((dev, host))
    except BaseException as e:
        out_q.put(e)
    out_q.put(None)


def main():
    from box2mask_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.postprocess.device_post import (make_fused_infer,
                                                      device_masks_to_results)
    from box2mask_tpu.datasets.tables import get_tables

    cfg = make_cfg()
    valid_ids, _, _, is_fg = get_tables('scannet')
    model = S.build_model(cfg, num_classes=20)
    # fused pipeline: maps + forward + per-scene postproc in ONE device call
    infer = make_fused_infer(cfg, model, valid_ids, is_fg, max_masks=256)
    ths = None   # jnp copy of cfg.eval_ths, made after jax init below

    from concurrent.futures import ThreadPoolExecutor
    q = queue.Queue(maxsize=4)
    total_batches = (N_WARMUP + N_SCENES + BATCH - 1) // BATCH
    warmup_batches = 1
    t = threading.Thread(target=scene_stream, args=(cfg, total_batches, q),
                         daemon=True)
    t.start()
    post_pool = ThreadPoolExecutor(max_workers=4)

    variables = None
    n_done = 0
    t_start = None
    vox_counts = []
    futures = []
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        dev, host = item
        batch = {k: jnp.asarray(v) for k, v in dev.items()}
        if variables is None:
            variables = S.init_variables(model, batch)
            params, stats = variables['params'], variables['batch_stats']
            ths = jnp.asarray(cfg.eval_ths, jnp.float32)
        _, outs = infer(params, stats, batch, ths)   # async dispatch

        for si in range(len(host['scene'])):
            out = outs[si]

            def post(out=out, dev=dev, host=host, si=si):
                # device->host readback happens here, in the worker, so the
                # main loop keeps the device queue full
                out_np = {k: np.asarray(v) for k, v in out.items()}
                return device_masks_to_results(out_np, dev, host, valid_ids,
                                               si, mode='eval')
            futures.append(post_pool.submit(post))
        n_done += 1
        vox_counts.append(int(dev['num0']))
        if n_done == warmup_batches:
            for f in futures:
                f.result()          # drain warm-up postproc
            futures = []
            t_start = time.time()
    for f in futures:
        f.result()
    elapsed = time.time() - t_start
    n_timed = (n_done - warmup_batches) * BATCH
    scenes_per_sec = n_timed / elapsed

    result = {
        'metric': 'scannet_val_scale_inference_throughput',
        'value': round(scenes_per_sec, 3),
        'unit': 'scenes/sec/chip',
        'vs_baseline': round(scenes_per_sec / 10.0, 3),
        'detail': {
            'n_scenes': n_timed,
            'batch_size': BATCH,
            'mean_batch_voxels': int(np.mean(vox_counts)),
            'platform': jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
