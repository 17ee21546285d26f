#!/usr/bin/env python
"""Per-conv-site timing table of the SelectionNet forward at bench scale.

Times every conv site of the real network (stem 5^3, stride-2 downs, encoder/
decoder 3^3 blocks, transpose ups) with tunnel-proof methodology: N dispatches
are queued back-to-back and the timed window ends in ONE data fetch
(float(sum(out))), so per-rep cost = (window - 1 RTT)/N. `block_until_ready`
alone UNDER-measures sub-RTT work on the axon tunnel (DESIGN.md round-3
measurement trust).

Run: python scripts/profile_levels.py [batch] [reps]
Produces the device-wall breakdown the round-3 verdict asked for (#2).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main():
    from box2mask_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import bench
    bench.BATCH = BATCH
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.sparse import key_conv as KC
    from box2mask_tpu.sparse import ops
    from box2mask_tpu.nn.unet import INIT_DIM, ENC_PLANES, DEC_PLANES

    cfg = bench.make_cfg()
    batches, _ = bench.build_pool(cfg, 1)
    dev_np, host = batches[0]
    batch = {k: jnp.asarray(v) for k, v in dev_np.items()}
    full = S.ensure_maps(batch)
    rng = np.random.RandomState(0)

    # measure the tunnel RTT: dispatch+fetch of a trivial op on fresh data
    @jax.jit
    def null(x):
        return x + 1.0
    z = jnp.zeros((8, 128), jnp.float32)
    z = null(z)
    float(jnp.sum(z))
    t0 = time.perf_counter()
    z = null(z)
    float(jnp.sum(z))
    rtt = time.perf_counter() - t0
    print(f'null dispatch+fetch RTT: {rtt*1e3:.1f} ms')

    rows = []

    def timeit(tag, fn, mult=1):
        out = fn()
        float(jnp.sum(out))                     # compile + sync
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn()
        float(jnp.sum(out))                     # ONE terminating fetch
        dt = (time.perf_counter() - t0 - rtt) / REPS * 1e3
        rows.append((tag, dt, mult))
        print(f'{tag:<34} {dt:8.2f} ms  x{mult}')
        return dt

    def kc(tag, l, cin, cout, ksize, mult=1):
        keys = full[f'keys{l}_b']
        kb, kcnt = (f'kc{ksize}_base{l}', f'kc{ksize}_cnt{l}') \
            if ksize != 2 else (f'kcd_base{l}', f'kcd_cnt{l}')
        if kb not in full:
            return
        w = jnp.asarray(rng.randn(ksize ** 3 if ksize != 2 else 8, cin, cout)
                        .astype(np.float32) * 0.02)
        x = jnp.asarray(rng.rand(keys.size, cin).astype(np.float32))
        kout = keys.reshape(-1, 1) if ksize != 2 else \
            full[f'keys{l + 1}_b'].reshape(-1, 1)
        timeit(tag, lambda: KC.key_conv(
            x, keys, kout, full[kb], full[kcnt], w,
            kernel_size=ksize if ksize != 2 else 2,
            stride_child=(ksize == 2), scale=1 << l,
            guard=(ksize != 2)), mult)

    def up(tag, l, cin, cout, mult=1):
        # the product up path: stride_parent key match over the kcu plans
        # (kc batches ship no up_parent since round 5)
        if f'kcu_base{l}' not in full:
            return
        coarse = full[f'keys{l + 1}_b']
        fine_col = full[f'keys{l}_b'].reshape(-1, 1)
        w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.rand(coarse.size, cin).astype(np.float32))
        timeit(tag, lambda: KC.key_conv(
            x, coarse, fine_col, full[f'kcu_base{l}'], full[f'kcu_cnt{l}'],
            w, kernel_size=2, stride_parent=True, scale=1 << l, guard=False,
            window=KC.WINDOW_UP), mult)

    def stem_gather(tag):
        # round-5 search+gather stem (the product stem path) vs the one-hot
        # row above
        keys = full['keys0_b']
        w = jnp.asarray(rng.randn(125, 3, INIT_DIM).astype(np.float32) * .02)
        x = jnp.asarray(rng.rand(keys.size, 3).astype(np.float32))
        timeit(tag, lambda: KC.key_conv_stem(
            x, keys, full['kc5_base0'], full['kc5_cnt0'], w,
            window=KC.WINDOW_STEM))

    # ---- encoder ----
    kc('stem 5^3 L0 3->32 (one-hot, x0)', 0, 3, INIT_DIM, 5, mult=0)
    stem_gather('stem 5^3 L0 3->32 (gather)')
    width = INIT_DIM
    for l in range(1, 8):
        kc(f'down L{l-1}->L{l} {width}ch', l - 1, width, width, 2)
        planes = ENC_PLANES[l - 1]
        kc(f'enc L{l} 3^3 {width}->{planes}', l, width, planes, 3)
        kc(f'enc L{l} 3^3 {planes}ch', l, planes, planes, 3,
           mult=2 * cfg.layers - 1)
        width = planes
    # ---- decoder ----
    for i, l in enumerate(range(6, -1, -1)):
        planes = DEC_PLANES[i]
        up(f'up L{l+1}->L{l} {width}->{planes}', l, width, planes)
        skip = INIT_DIM if l == 0 else ENC_PLANES[l - 1]
        kc(f'dec L{l} 3^3 {planes+skip}->{planes}', l, planes + skip,
           planes, 3)
        kc(f'dec L{l} 3^3 {planes}ch', l, planes, planes, 3,
           mult=2 * cfg.layers - 1)
        width = planes

    total = sum(dt * m for _, dt, m in rows)
    print(f'\nsum of conv sites: {total:.1f} ms per {BATCH}-scene batch '
          f'({total/BATCH:.1f} ms/scene)')

    # full forward for the residual (BN/relu/pool/heads + fusion wins)
    model = S.build_model(cfg, num_classes=20)
    variables = S.init_variables(model, batch)
    params, stats = variables['params'], variables['batch_stats']
    fwd = S.make_forward(cfg, model)
    timeit('FULL forward', lambda: fwd(params, stats, batch)[cfg.mlp_bb_scores])


if __name__ == '__main__':
    main()
