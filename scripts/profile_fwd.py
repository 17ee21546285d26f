#!/usr/bin/env python
"""Isolate forward vs postproc on-device cost at bench scale (B=4)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def t(fn, n=6, warmup=2):
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
    from box2mask_tpu.datasets.tables import get_tables

    cfg = bench.make_cfg()
    valid_ids, _, _, is_fg = get_tables('scannet')
    model = S.build_model(cfg, num_classes=20)
    batches, _ = bench.build_pool(cfg, 1)
    dev_np, host = batches[0]
    batch = {k: jnp.asarray(v) for k, v in dev_np.items()}
    variables = S.init_variables(model, batch)
    params, stats = variables['params'], variables['batch_stats']

    @jax.jit
    def fwd(params, stats, batch):
        full = S.ensure_maps(batch)
        return model.apply({'params': params, 'batch_stats': stats},
                           full, train=False)

    def run():
        p = fwd(params, stats, batch)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), p)
    dt = t(run)
    print(f'forward only (all heads blocked): {dt*1e3:.1f} ms/batch')

    # sum-reduced variant (rules out readback-of-heads effects)
    @jax.jit
    def fwd_sum(params, stats, batch):
        full = S.ensure_maps(batch)
        p = model.apply({'params': params, 'batch_stats': stats},
                        full, train=False)
        return sum(jnp.sum(v) for v in p.values())

    def run2():
        fwd_sum(params, stats, batch).block_until_ready()
    dt2 = t(run2)
    print(f'forward only (sum-reduced): {dt2*1e3:.1f} ms/batch')


if __name__ == '__main__':
    main()
