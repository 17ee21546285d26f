#!/usr/bin/env python
"""Per-site fwd/dx/dw timing of the TRAINING step — the round-4 verdict #2
breakdown. Default batch is 4 (the bench scale): per-site kernel cost is
linear in rows, the fwd/dx rows then REUSE profile_levels' cached programs
(dx = the same executable with transposed weights), and only the dw rows
compile fresh — a bs=8 sweep would recompile every site for hours through
the remote compile service. Scale per-site numbers by 2.23x for the bs=8
step (1.05M vs 470k rows); the whole-program remat A/B rows at the end run
at the argv batch too — their RELATIVE cost (refwd share per remat level)
is the decision input, the bs=8 FIT check lives in bench_train.

Methodology identical to profile_levels.py (tunnel-proof: N queued
dispatches, ONE terminating data fetch, null RTT subtracted). For every conv
site of SelectionNet it times the three kernels the custom VJPs run:

  fwd: key_conv forward (or the search+gather stem / stride_parent up)
  dx:  the mirrored-weights forward (same plans) / the transpose structure
  dw:  the grid-accumulating dw kernel over the same windows

plus whole-program rows: full forward, full loss+grad (the real train step's
compute), and the remat / no-remat A/B where HBM allows.

Run: python scripts/profile_train.py [batch] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    from box2mask_tpu import runtime
    runtime.setup()
    import jax
    import jax.numpy as jnp
    import bench
    bench.BATCH = BATCH
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.sparse import key_conv as KC
    from box2mask_tpu.nn.unet import INIT_DIM, ENC_PLANES, DEC_PLANES

    cfg = bench.make_cfg()
    batches, _ = bench.build_pool(cfg, 1)
    dev_np, _ = batches[0]
    batch = {k: jnp.asarray(v) for k, v in dev_np.items()}
    full = S.ensure_maps(batch)
    rng = np.random.RandomState(0)

    @jax.jit
    def null(x):
        return x + 1.0
    z = null(jnp.zeros((8, 128), jnp.float32))
    float(jnp.sum(z))
    t0 = time.perf_counter()
    z = null(z)
    float(jnp.sum(z))
    rtt = time.perf_counter() - t0
    print(f'null dispatch+fetch RTT: {rtt*1e3:.1f} ms')

    rows = []

    def timeit(tag, fn, mult=1):
        out = fn()
        float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn()
        float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
        dt = (time.perf_counter() - t0 - rtt) / REPS * 1e3
        rows.append((tag, dt, mult))
        print(f'{tag:<40} {dt:8.2f} ms  x{mult}', flush=True)
        return dt

    DW_SITES = ('stem', 'enc L1', 'dec L0', 'dec L1', 'dec L2',
                'enc L4', 'down L0', 'up L1')

    def want_dw(tag):
        # dw rows compile fresh (never profiled before round 5): restrict
        # them to the sites that dominate the wall + one deep/wide outlier
        return any(tag.startswith(p) for p in DW_SITES)

    def site(tag, l, cin, cout, ksize, mult=1):
        """fwd + dx + dw of one same-level conv site (3^3 or the 5^3 stem)."""
        keys = full[f'keys{l}_b']
        kb, kcnt = f'kc{ksize}_base{l}', f'kc{ksize}_cnt{l}'
        if kb not in full:
            return
        K = ksize ** 3
        w = jnp.asarray(rng.randn(K, cin, cout).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.rand(keys.size, cin).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(rng.rand(keys.size, cout).astype(np.float32))
        kout = keys.reshape(-1, 1)
        win = KC.WINDOW_STEM if ksize == 5 else KC.WINDOW
        if ksize == 5:
            timeit(f'{tag} fwd(gather)', lambda: KC.key_conv_stem(
                x.astype(jnp.float32), keys, full[kb], full[kcnt], w,
                window=win), mult)
            # stem dx is never computed (input is data); dw = the gather
            # dw kernel (the product backward path since round 5)
            timeit(f'{tag} dw(gather)', lambda: KC.key_conv_stem_dw(
                x.astype(jnp.float32), g, keys, full[kb], full[kcnt],
                window=win), mult)
        else:
            timeit(f'{tag} fwd', lambda: KC.key_conv(
                x, keys, kout, full[kb], full[kcnt], w,
                kernel_size=ksize, scale=1 << l, guard=True, window=win),
                mult)
            timeit(f'{tag} dx', lambda: KC.key_conv(
                g, keys, kout, full[kb], full[kcnt],
                KC._mirror_weights(w), kernel_size=ksize, scale=1 << l,
                guard=True, window=win), mult)
        if want_dw(tag):
            timeit(f'{tag} dw', lambda: KC.key_conv_dw(
                x, g, keys, kout, full[kb], full[kcnt], kernel_size=ksize,
                scale=1 << l, guard=True, window=win), mult)

    def down_site(tag, l, cin, cout, mult=1):
        keys = full[f'keys{l}_b']
        if f'kcd_base{l}' not in full:
            return
        coarse_col = full[f'keys{l + 1}_b'].reshape(-1, 1)
        w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.rand(keys.size, cin).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(
            rng.rand(full[f'keys{l + 1}_b'].size, cout).astype(np.float32))
        timeit(f'{tag} fwd', lambda: KC.key_conv(
            x, keys, coarse_col, full[f'kcd_base{l}'], full[f'kcd_cnt{l}'],
            w, kernel_size=2, stride_child=True, scale=1 << l, guard=False,
            window=KC.WINDOW), mult)
        # dx = the stride_parent kernel over the kcu plans
        timeit(f'{tag} dx(up)', lambda: KC.key_conv(
            g, full[f'keys{l + 1}_b'], keys.reshape(-1, 1),
            full[f'kcu_base{l}'], full[f'kcu_cnt{l}'],
            jnp.transpose(w, (0, 2, 1)), kernel_size=2, stride_parent=True,
            scale=1 << l, guard=False, window=KC.WINDOW_UP), mult)
        if want_dw(tag):
            timeit(f'{tag} dw', lambda: KC.key_conv_dw(
                x, g, keys, coarse_col, full[f'kcd_base{l}'],
                full[f'kcd_cnt{l}'], kernel_size=2, stride_child=True,
                scale=1 << l, guard=False, window=KC.WINDOW), mult)

    def up_site(tag, l, cin, cout, mult=1):
        if f'kcu_base{l}' not in full:
            return
        coarse = full[f'keys{l + 1}_b']
        fine_col = full[f'keys{l}_b'].reshape(-1, 1)
        w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.rand(coarse.size, cin).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(
            rng.rand(full[f'keys{l}_b'].size, cout).astype(np.float32))
        timeit(f'{tag} fwd', lambda: KC.key_conv(
            x, coarse, fine_col, full[f'kcu_base{l}'], full[f'kcu_cnt{l}'],
            w, kernel_size=2, stride_parent=True, scale=1 << l, guard=False,
            window=KC.WINDOW_UP), mult)
        # dx = the stride-2 down conv of the cotangent over the kcd plans
        timeit(f'{tag} dx(down)', lambda: KC.key_conv(
            g, full[f'keys{l}_b'], coarse.reshape(-1, 1),
            full[f'kcd_base{l}'], full[f'kcd_cnt{l}'],
            jnp.transpose(w, (0, 2, 1)), kernel_size=2, stride_child=True,
            scale=1 << l, guard=False, window=KC.WINDOW), mult)
        if want_dw(tag):
            timeit(f'{tag} dw', lambda: KC.key_conv_dw(
                x, g, coarse, fine_col, full[f'kcu_base{l}'],
                full[f'kcu_cnt{l}'], kernel_size=2, stride_parent=True,
                scale=1 << l, guard=False, window=KC.WINDOW_UP), mult)

    site('stem 5^3 3->32', 0, 3, INIT_DIM, 5)
    width = INIT_DIM
    for l in range(1, 8):
        down_site(f'down L{l-1}->L{l} {width}ch', l - 1, width, width)
        planes = ENC_PLANES[l - 1]
        site(f'enc L{l} {width}->{planes}', l, width, planes, 3)
        site(f'enc L{l} {planes}ch', l, planes, planes, 3,
             mult=2 * cfg.layers - 1)
        width = planes
    for i, l in enumerate(range(6, -1, -1)):
        planes = DEC_PLANES[i]
        up_site(f'up L{l+1}->L{l} {width}->{planes}', l, width, planes)
        skip = INIT_DIM if l == 0 else ENC_PLANES[l - 1]
        site(f'dec L{l} {planes+skip}->{planes}', l, planes + skip, planes, 3)
        site(f'dec L{l} {planes}ch', l, planes, planes, 3,
             mult=2 * cfg.layers - 1)
        width = planes

    total = sum(dt * m for _, dt, m in rows)
    fwd_total = sum(dt * m for tag, dt, m in rows if ' fwd' in tag)
    dx_total = sum(dt * m for tag, dt, m in rows if ' dx' in tag)
    dw_total = sum(dt * m for tag, dt, m in rows if ' dw' in tag)
    print(f'\nconv-site sums per {BATCH}-scene batch: '
          f'fwd {fwd_total:.0f} + dx {dx_total:.0f} + dw {dw_total:.0f} '
          f'= {total:.0f} ms  (remat adds ~another fwd)')

    # ---- whole-program rows: forward / loss+grad, remat vs not ----
    from box2mask_tpu.nn import losses as L
    from box2mask_tpu.datasets.tables import get_tables
    import copy
    for remat, levels in ((False, 7), (True, 7), (True, 1), (True, 2)):
        cfg_r = copy.copy(cfg)
        cfg_r.remat = remat
        cfg_r.remat_levels = levels
        remat = f'{remat}/L<={levels}' if remat else remat
        model = S.build_model(cfg_r, num_classes=20)
        try:
            variables = S.init_variables(model, batch, train=False)
        except Exception as e:
            print(f'remat={remat}: init failed ({type(e).__name__})')
            continue
        params, stats = variables['params'], variables['batch_stats']

        def loss_fn(p):
            out, _ = model.apply({'params': p, 'batch_stats': stats},
                                 S.ensure_maps(batch), train=True,
                                 mutable=['batch_stats'])
            tot = 0.
            for k, v in out.items():
                if hasattr(v, 'dtype'):
                    tot = tot + jnp.sum(v.astype(jnp.float32) ** 2) * 1e-6
            return tot

        vg = jax.jit(jax.value_and_grad(loss_fn))
        fwd_j = jax.jit(loss_fn)
        try:
            timeit(f'FULL fwd (remat={remat})', lambda: fwd_j(params))
            timeit(f'FULL fwd+bwd (remat={remat})',
                   lambda: vg(params)[1]['stem_conv']['kernel'])
        except Exception as e:
            print(f'remat={remat}: {type(e).__name__}: {str(e)[:120]}')


if __name__ == '__main__':
    main()
