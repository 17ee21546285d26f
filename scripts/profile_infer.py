#!/usr/bin/env python
"""Measured breakdown of the inference wall (VERDICT r2 weak #1).

Times each stage of the bench pipeline separately on the real chip:
  1. RTT probe: device_get of a scalar (tunnel round-trip)
  2. BW probe: device_get of 1MB (tunnel bandwidth)
  3. fused infer dispatch + block (device-side wall per batch)
  4. per-scene readback path (device_masks_to_results)
  5. end-to-end as bench.py runs it

Run: python scripts/profile_infer.py [batch_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def t(fn, n=8, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    from box2mask_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import bench
    bench.BATCH = BATCH
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.postprocess.device_post import (make_fused_infer,
                                                      device_masks_to_results)
    from box2mask_tpu.datasets.tables import get_tables

    cfg = bench.make_cfg()
    valid_ids, _, _, is_fg = get_tables('scannet')
    model = S.build_model(cfg, num_classes=20)
    infer = make_fused_infer(cfg, model, valid_ids, is_fg, max_masks=256)

    batches, prep = bench.build_pool(cfg, max(1, 4 // BATCH))
    dev_batches = [({k: jnp.asarray(v) for k, v in dev.items()}, dev, host)
                   for dev, host in batches]
    variables = S.init_variables(model, dev_batches[0][0])
    params, stats = variables['params'], variables['batch_stats']
    ths = jnp.asarray(cfg.eval_ths, jnp.float32)

    print(f'host_prep_s_per_scene={prep:.3f}')

    # --- probes ---
    scalar = jnp.zeros((), jnp.int32) + 1
    scalar.block_until_ready()
    rtt = t(lambda: jax.device_get(scalar), n=16)
    print(f'RTT (scalar device_get): {rtt*1e3:.1f} ms')

    mb = jnp.zeros((1024, 1024), jnp.uint8) + 1
    mb.block_until_ready()
    bw = t(lambda: jax.device_get(mb), n=8)
    print(f'1MB device_get: {bw*1e3:.1f} ms -> {1.0/bw:.1f} MB/s')

    big = jnp.zeros((8, 1024, 1024), jnp.uint8) + 1
    big.block_until_ready()
    bw8 = t(lambda: jax.device_get(big), n=4)
    print(f'8MB device_get: {bw8*1e3:.1f} ms -> {8.0/bw8:.1f} MB/s')

    # dispatch-only RTT (tiny jitted op, blocked)
    tiny = jax.jit(lambda x: x + 1)
    _ = tiny(scalar).block_until_ready()
    disp = t(lambda: tiny(scalar).block_until_ready(), n=16)
    print(f'dispatch+block tiny op: {disp*1e3:.1f} ms')

    # --- fused infer device wall (stacked API) ---
    from box2mask_tpu.postprocess.device_post import stacked_masks_to_results
    batch, dev, host = dev_batches[0]
    packed_key = None

    def run_infer():
        _, out = infer(params, stats, batch, ths)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        return out

    dt = t(run_infer, n=6)
    print(f'fused infer (dispatch+device, batch={BATCH}): {dt*1e3:.1f} ms '
          f'-> {dt/BATCH*1e3:.1f} ms/scene')

    # --- readback path ---
    _, out = infer(params, stats, batch, ths)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    packed_key = ('seg_masks_packed' if 'seg_masks_packed' in out
                  else 'masks_packed')
    sz = np.prod(out[packed_key].shape) / 1e6
    dg = t(lambda: jax.device_get(out), n=6)
    print(f'stacked device_get (incl {sz:.2f}MB {packed_key}): '
          f'{dg*1e3:.1f} ms -> {dg/BATCH*1e3:.1f} ms/scene')

    out_np = jax.device_get(out)

    def unpack():
        stacked_masks_to_results(out_np, dev, host, valid_ids, mode='eval')
    du = t(unpack, n=6)
    print(f'host unpack (all scenes): {du*1e3:.1f} ms '
          f'-> {du/BATCH*1e3:.1f} ms/scene')

    # --- h2d of the numpy batch ---
    dev_np, _ = batches[0]
    dh = t(lambda: jax.tree_util.tree_map(
        lambda x: x.block_until_ready(),
        jax.device_put(dev_np)), n=4)
    mb_up = sum(np.asarray(v).nbytes for v in dev_np.values()) / 1e6
    print(f'H2D full batch ({mb_up:.1f}MB): {dh*1e3:.1f} ms')

    # --- end-to-end (bench loop, threads overlap readback) ---
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=2)

    def read_one(o, dv, hs):
        o_np = jax.device_get(o)
        return stacked_masks_to_results(o_np, dv, hs, valid_ids, mode='eval')

    def e2e(n_batches):
        futures = []
        for b in range(n_batches):
            bt, dv, hs = dev_batches[b % len(dev_batches)]
            _, o = infer(params, stats, bt, ths)
            futures.append(pool.submit(read_one, o, dv, hs))
        [f.result() for f in futures]

    e2e(2)
    nb_ = max(1, 16 // BATCH)
    t0 = time.perf_counter()
    e2e(nb_)
    el = time.perf_counter() - t0
    print(f'end-to-end: {el/(nb_*BATCH)*1e3:.1f} ms/scene '
          f'({nb_*BATCH/el:.2f} scenes/sec)')


if __name__ == '__main__':
    main()
