#!/usr/bin/env python
"""On-chip stage split of the fused inference: forward vs per-scene postproc.

Times, at the bench's ScanNet scale (B=4 default):
  1. unpack+maps+forward only (jit, block)
  2. forward + N-scene postproc for N in 1..B (marginal postproc cost/scene)
  3. stem conv alone / all level-0 convs (the FLOPs hotspots)

Run: python scripts/profile_stages.py [batch]
"""

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
    from box2mask_tpu.postprocess.device_post import _make_core, _pack_bits
    from box2mask_tpu.datasets.tables import get_tables

    cfg = bench.make_cfg()
    valid_ids, _, _, is_fg = get_tables('scannet')
    model = S.build_model(cfg, num_classes=20)
    batches, _ = bench.build_pool(cfg, 1)
    dev_np, host = batches[0]
    batch = {k: jnp.asarray(v) for k, v in dev_np.items()}
    variables = S.init_variables(model, batch)
    params, stats = variables['params'], variables['batch_stats']
    ths = jnp.asarray(cfg.eval_ths, jnp.float32)
    core = _make_core(cfg, valid_ids, is_fg, 256)

    def make_fn(n_scenes, with_fwd=True):
        @jax.jit
        def fn(params, stats, batch, ths):
            full = S.ensure_maps(batch)
            pred = model.apply({'params': params, 'batch_stats': stats},
                               full, train=False)
            B = batch['keys0_b'].shape[0]
            vs = full['valid0'].shape[0] // B
            outs = []
            for b in range(n_scenes):
                o = core(pred, full, jnp.int32(b), ths,
                         vox_slice=slice(b * vs, (b + 1) * vs))
                o.pop('masks')
                o['seg_masks_packed'] = _pack_bits(o.pop('seg_masks')[:64])
                outs.append(o)
            if outs:
                return pred['mlp_bb_scores'], \
                    {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}
            return pred['mlp_bb_scores'], {}
        return fn

    for n_sc in [0, 1, BATCH]:
        fn = make_fn(n_sc)

        def run():
            p, o = fn(params, stats, batch, ths)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), (p, o))
        dt = t(run)
        print(f'fwd + {n_sc}-scene postproc: {dt*1e3:.1f} ms/batch')

    # ---- conv-level: stem alone, then per-level same-conv cost ----
    from box2mask_tpu.sparse import key_conv as KC
    full = S.ensure_maps(batch)
    x0 = jnp.zeros((full['keys0_b'].size, 3), jnp.float32) + 0.5
    rng = np.random.RandomState(0)

    def conv_at(l, cin, cout, ksize, tag):
        keys = full[f'keys{l}_b']
        kb = f'kc{ksize}_base{l}' if ksize != 2 else f'kcd_base{l}'
        kc = f'kc{ksize}_cnt{l}' if ksize != 2 else f'kcd_cnt{l}'
        if kb not in full:
            return
        w = jnp.asarray(rng.randn(ksize ** 3 if ksize != 2 else 8,
                                  cin, cout).astype(np.float32) * 0.02)
        x = jnp.zeros((keys.size, cin), jnp.bfloat16) + 0.5
        kout = keys.reshape(-1, 1) if ksize != 2 else \
            full[f'keys{l + 1}_b'].reshape(-1, 1)
        sc = 1 << l

        def run():
            KC.key_conv(x, keys, kout, full[kb], full[kc], w,
                        kernel_size=ksize if ksize != 2 else 2,
                        stride_child=(ksize == 2), scale=sc,
                        guard=(ksize != 2)).block_until_ready()
        dt = t(run)
        print(f'{tag}: {dt*1e3:.2f} ms/batch')

    conv_at(0, 3, 32, 5, 'stem 5^3 l0 3->32')
    conv_at(0, 96, 96, 3, 'conv 3^3 l0 96ch')
    conv_at(1, 32, 32, 3, 'conv 3^3 l1 32ch')
    conv_at(1, 96, 96, 3, 'conv 3^3 l1 96ch')
    conv_at(2, 128, 128, 3, 'conv 3^3 l2 128ch')
    conv_at(0, 32, 32, 2, 'down 2^3 l0->1 32ch')
    for l in range(8):
        print(f'level {l}: n={int(np.sum(np.asarray(dev_np[f"keys{l}_b"]) < 2**30))} '
              f'pad={dev_np[f"keys{l}_b"].shape}')


if __name__ == '__main__':
    main()
