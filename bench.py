#!/usr/bin/env python
"""Benchmark: ScanNet-scale inference throughput (scenes/sec/chip).

Measures the device inference pipeline on realistic ScanNet-val-scale
synthetic scenes (~120k voxels @ 2cm). The timed window covers, per batch:
host->device upload of the numpy batch (H2D is INSIDE the window), one fused
dispatch (coordinate handling + jitted SelectionNet forward + fully on-device
vote->mask post-processing for every scene of the batch), and readback of the
stacked result (one device_get per batch; packed-mask unpacking + vox->point
projection run in overlapped host threads). Prints ONE JSON line; the
north-star target is >10 scenes/sec/chip (BASELINE.md).

Scene preparation (synthetic generation + voxelization + batch build) happens
ONCE for a pool of unique scenes before the timed window and is reported
separately as host_prep_s_per_scene: it is embarrassingly parallel across
loader workers (the reference uses 16 worker processes; datasets/loader.py
threads here), but this bench host has a single CPU core (detail.host_cores),
which would otherwise measure the host, not the chip. Sustaining the reported
rate in production needs ~ceil(rate * host_prep_s_per_scene) dedicated
prep cores.
"""

import json
import os
import sys
import time

import numpy as np

# BATCH=4 default: one packed upload + one dispatch + one readback per 4
# scenes amortizes the tunnel round-trip latency that dominates bad-tunnel
# sessions — measured 2026-08-17 on the SAME degraded tunnel: 0.691
# scenes/sec at BATCH=1 vs 4.115 at BATCH=4 (6x; DESIGN.md round-3 journal)
N_SCENES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
# every TIMED batch is a unique scene set, and warm-up runs on two EXTRA
# batches: the tunnel's remote executor may memoize repeated
# (executable, args) executions, so re-timing a batch that already ran
# (even in warm-up) could measure the cache instead of the machine
N_POOL = int(sys.argv[3]) if len(sys.argv) > 3 else N_SCENES + 2 * BATCH
TOP_K = 128


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


def build_pool(cfg, n_batches):
    """Prep a pool of unique numpy batches; returns (batches, prep s/scene)."""
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

    batches = []
    t0 = time.time()
    for b in range(n_batches):
        rets = [make_ret(b * BATCH + i) for i in range(BATCH)]
        batches.append(build_batch(rets, cfg, sem_id2idx, mode='val'))
    prep = (time.time() - t0) / (n_batches * BATCH)
    return batches, prep


def bench_train(cfg, model, jax, jnp, S):
    """Training steps/sec at ScanNet scale through the DEFAULT train path
    (--key_conv on: map-free pallas convs with exact custom VJPs). The
    reference's headline cost is the 101h training run (README.md:75); this
    measures the pure device step (batches resident — in production the
    packed single-buffer upload, ~7ms for 5MB, overlaps steps via prefetch).
    """
    from box2mask_tpu.datasets import synthetic, supervision
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
        supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
        return ret

    dev_np = [build_batch([make_ret(i)], cfg, sem_id2idx, mode='train')[0]
              for i in range(2)]
    key_conv_active = 'kc3_base0' in dev_np[0]
    dev_b = [jax.device_put(d) for d in dev_np]
    tx = S.make_optimizer(cfg)
    state = S.init_state(cfg, model, tx, dev_b[0])
    step = S.make_train_step(cfg, model, tx)   # donate=True: the real
    # trainer path (state buffers reused in-place, no per-step HBM copy)
    lr, one = jnp.float32(1e-3), jnp.float32(1.0)
    for b in dev_b:                                  # warm-up + compile
        state, _ = step(state, b, lr, one, one)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), state.params)
    n_steps = 10
    t0 = time.time()
    for i in range(n_steps):
        state, ld = step(state, dev_b[i % 2], lr, one, one)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), state.params)
    dt = time.time() - t0
    return {
        'train_steps_per_sec': round(n_steps / dt, 3),
        'train_scenes_per_sec': round(n_steps * 1 / dt, 3),
        'train_batch_voxels': int(dev_np[0]['num0']),
        'train_key_conv_active': bool(key_conv_active),
    }


def main():
    from box2mask_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.postprocess.device_post import (
        make_fused_infer, stacked_masks_to_results)
    from box2mask_tpu.datasets.tables import get_tables

    cfg = make_cfg()
    valid_ids, _, _, is_fg = get_tables('scannet')
    model = S.build_model(cfg, num_classes=20)
    # fused pipeline: maps + forward + per-scene postproc in ONE device call;
    # the whole batch's masks read back in ONE device_get (top_k packed rows
    # per scene over its own voxel window)
    batches, prep_per_scene = build_pool(cfg, max(1, N_POOL // BATCH))
    infer = make_fused_infer(cfg, model, valid_ids, is_fg, max_masks=256,
                             top_k=TOP_K, packed_example=batches[0][0])

    variables = S.init_variables(
        model, jax.device_put(batches[0][0]))
    params, stats = variables['params'], variables['batch_stats']
    ths = jnp.asarray(cfg.eval_ths, jnp.float32)
    read_pool = ThreadPoolExecutor(max_workers=3)

    def read_one(out, dev, host):
        out_np = jax.device_get(out)     # one transfer for the whole batch
        return stacked_masks_to_results(out_np, dev, host, valid_ids,
                                        mode='eval')

    # pre-pack each batch dict into ONE contiguous compact-wire buffer; the
    # pack is a host memcpy the prefetch workers would do in production, but
    # the UPLOAD (device_put of the buffer) stays inside the timed window —
    # shipping ~50 arrays individually costs ~50 tunnel round-trips (~1.7s
    # measured), the single compact buffer ships ~1.5MB at wire bandwidth
    packed = [infer.pack(dev) for dev, _ in batches]

    def run(idxs, depth=2):
        # 2-deep software pipeline: dispatch batch b, then harvest batch
        # b-2 — upload/dispatch are async (~10ms measured), so the only
        # blocking op is the harvest, and at depth 2 the fetch + host unpack
        # of b-2 (~300ms on a degraded tunnel) hides behind TWO batches of
        # device time instead of racing one (scripts/profile_pipeline.py
        # breakdown, DESIGN.md round-3)
        results = []
        pending = []                      # [(future, dev, host), ...]
        for i in idxs:
            dev, host = batches[i % len(batches)]
            buf = jax.device_put(packed[i % len(batches)])  # H2D, one array
            _, out = infer(params, stats, buf, ths)     # async dispatch
            pending.append((read_pool.submit(read_one, out, dev, host),
                            dev, host))
            if len(pending) > depth:
                results.append(pending.pop(0)[0].result())
        results.extend(p[0].result() for p in pending)
        assert all(r for r in results)
        return results

    n_batches = (N_SCENES + BATCH - 1) // BATCH
    # warm-up + compile on batches the timed window never touches (see
    # N_POOL note: re-running an already-executed batch could be served
    # from an execution cache)
    run(range(n_batches, min(n_batches + 2, len(batches))) or range(2))
    t0 = time.time()
    run(range(n_batches))
    elapsed = time.time() - t0
    n_timed = n_batches * BATCH
    scenes_per_sec = n_timed / elapsed

    train_detail = bench_train(cfg, model, jax, jnp, S)

    result = {
        'metric': 'scannet_val_scale_inference_throughput',
        'value': round(scenes_per_sec, 3),
        'unit': 'scenes/sec/chip',
        'vs_baseline': round(scenes_per_sec / 10.0, 3),
        'detail': {
            'n_scenes': n_timed,
            'batch_size': BATCH,
            'unique_scenes': min(n_batches, len(batches)) * BATCH,
            'warmup_on_separate_batches': len(batches) > n_batches,
            'mean_batch_voxels': int(np.mean(
                [int(d['num0']) for d, _ in batches])),
            'h2d_in_timed_window': True,
            'host_prep_s_per_scene': round(prep_per_scene, 3),
            'host_cores': os.cpu_count(),
            'top_k_masks': TOP_K,
            'platform': jax.devices()[0].platform,
            **train_detail,
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
