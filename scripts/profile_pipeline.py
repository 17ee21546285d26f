#!/usr/bin/env python
"""Timestamp every pipeline op of the bench loop to find serialization.

For each batch: device_put wall, dispatch wall, harvest wait, and the gap
accounting vs the pure device wall. Run on the chip:
    python scripts/profile_pipeline.py [n_batches] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import bench
from box2mask_tpu import runtime

runtime.setup()
import jax                                      # noqa: E402
import jax.numpy as jnp                         # noqa: E402
from concurrent.futures import ThreadPoolExecutor  # noqa: E402
from box2mask_tpu.engine import state as S      # noqa: E402
from box2mask_tpu.postprocess.device_post import (   # noqa: E402
    make_fused_infer, stacked_masks_to_results)
from box2mask_tpu.datasets.tables import get_tables  # noqa: E402

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 6
bench.BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main():
    cfg = bench.make_cfg()
    valid_ids, _, _, is_fg = get_tables('scannet')
    model = S.build_model(cfg, num_classes=20)
    batches, _ = bench.build_pool(cfg, 2)
    infer = bench_infer = make_fused_infer(
        cfg, model, valid_ids, is_fg, max_masks=256, top_k=bench.TOP_K,
        packed_example=batches[0][0])
    variables = S.init_variables(model, jax.device_put(batches[0][0]))
    params, stats = variables['params'], variables['batch_stats']
    ths = jnp.asarray(cfg.eval_ths, jnp.float32)
    packed = [infer.pack(dev) for dev, _ in batches]
    pool = ThreadPoolExecutor(max_workers=2)

    def read_one(out, dev, host):
        t0 = time.perf_counter()
        out_np = jax.device_get(out)
        t1 = time.perf_counter()
        r = stacked_masks_to_results(out_np, dev, host, valid_ids,
                                     mode='eval')
        return r, t1 - t0, time.perf_counter() - t1

    # measure pure device wall once (dispatch+block, minus a null op RTT)
    buf = jax.device_put(packed[0])
    _, o = infer(params, stats, buf, ths)
    jax.block_until_ready(o)
    null = jax.jit(lambda x: x + 1)(jnp.float32(1.0))
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.float32(2.0)))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, o = infer(params, stats, buf, ths)
    jax.block_until_ready(o)
    wall = time.perf_counter() - t0
    print(f'null dispatch RTT {rtt * 1e3:.1f} ms; '
          f'fused dispatch+block {wall * 1e3:.1f} ms')

    depth = int(os.environ.get('B2M_DEPTH', '2'))
    pending = []
    t_start = time.perf_counter()
    for b in range(N_BATCHES):
        dev, host = batches[b % len(batches)]
        t0 = time.perf_counter()
        buf = jax.device_put(packed[b % len(batches)])
        t1 = time.perf_counter()
        _, out = infer(params, stats, buf, ths)
        t2 = time.perf_counter()
        pending.append((pool.submit(read_one, out, dev, host), dev, host))
        t3 = time.perf_counter()
        if len(pending) > depth:
            _, fetch_s, unpack_s = pending.pop(0)[0].result()
            t4 = time.perf_counter()
            print(f'b{b}: put {1e3 * (t1 - t0):7.1f}  dispatch '
                  f'{1e3 * (t2 - t1):7.1f}  submit {1e3 * (t3 - t2):7.1f}  '
                  f'harvest-wait {1e3 * (t4 - t3):7.1f}  '
                  f'(fetch {1e3 * fetch_s:6.1f} '
                  f'unpack {1e3 * unpack_s:6.1f})', flush=True)
    for p in pending:
        p[0].result()
    total = time.perf_counter() - t_start
    print(f'{N_BATCHES} batches in {total:.2f}s = '
          f'{N_BATCHES * bench.BATCH / total:.3f} scenes/sec')


if __name__ == '__main__':
    main()
