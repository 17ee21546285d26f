#!/usr/bin/env python
"""A/B: key_conv pallas kernel vs the XLA nmap gather_conv at bench scale.

Usage: python scripts/ab_key_conv.py [cin] [cout] [reps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from box2mask_tpu import runtime

runtime.setup()

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

from box2mask_tpu.config import get_config     # noqa: E402
from box2mask_tpu.datasets import synthetic    # noqa: E402
from box2mask_tpu.datasets.voxelize import voxelize_scene  # noqa: E402
from box2mask_tpu.sparse import key_conv as KC             # noqa: E402
from box2mask_tpu.sparse import ops            # noqa: E402
from box2mask_tpu.sparse.device_maps import SENT_KEY       # noqa: E402


def main():
    cin = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cout = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    tile = int(sys.argv[4]) if len(sys.argv) > 4 else KC.TILE
    win_arg = int(sys.argv[5]) if len(sys.argv) > 5 else KC.WINDOW

    cfg = get_config(['--config', 'configs/synthetic.txt'])
    scene, _ = synthetic.make_scene(
        seed=0, name='s', num_instances=24, points_per_instance=30000,
        floor_points=300000, wall_points=220000)
    ret = voxelize_scene(scene, cfg)
    c = ret['vox_coords'].astype(np.int64)
    n = len(c)
    pad = ((n + 4095) // 4096) * 4096
    print(f'voxels {n} pad {pad}')
    keys = ((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]).astype(np.int32)
    keys_p = np.full(pad, int(SENT_KEY), np.int32)
    keys_p[:n] = keys

    rng = np.random.default_rng(0)
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    w = (rng.normal(size=(27, cin, cout)) * 0.05).astype(np.float32)

    # --- nmap for the XLA path
    offs = KC.offsets_3d(3)
    nbr = np.full((pad, 27), pad, np.int32)
    for k, (dx, dy, dz) in enumerate(offs):
        ok = ((c[:, 0] + dx >= 0) & (c[:, 0] + dx < 1024)
              & (c[:, 1] + dy >= 0) & (c[:, 1] + dy < 1024)
              & (c[:, 2] + dz >= 0) & (c[:, 2] + dz < 1024))
        q = ((c[:, 0] + dx) << 20) | ((c[:, 1] + dy) << 10) | (c[:, 2] + dz)
        pos = np.searchsorted(keys, q)
        hit = ok & (pos < n) & (keys[np.minimum(pos, n - 1)] == q)
        nbr[:n, k] = np.where(hit, pos, pad)

    # --- key_conv plans
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(win_arg, pad)
    t0 = time.time()
    bases, counts = KC._host_bases(keys_p, keys_p, deltas, groups, win, pad,
                                   tile=tile)
    print(f'tile {tile} win {win} host plan {time.time() - t0:.4f}s  mean chunks/tile '
          f'{counts.mean(axis=0)}')

    xj = jnp.asarray(x)
    wj = jnp.asarray(w)
    nbrj = jnp.asarray(nbr)
    kb = jnp.asarray(keys_p[None])
    kcol = jnp.asarray(keys_p.reshape(-1, 1))
    bj, cj = jnp.asarray(bases[None]), jnp.asarray(counts[None])

    f_xla = jax.jit(lambda x, nbr, w: ops.gather_conv(x, nbr, w))
    f_key = jax.jit(lambda x, kb, kcol, b, c, w: KC.key_conv(
        x, kb, kcol, b, c, w, kernel_size=3, tile=tile, window=win))

    o1 = f_xla(xj, nbrj, wj).block_until_ready()
    o2 = f_key(xj, kb, kcol, bj, cj, wj).block_until_ready()
    d = np.abs(np.asarray(o1) - np.asarray(o2))
    rel = d.max() / (np.abs(np.asarray(o1)).max() + 1e-6)
    print(f'max abs diff {d.max():.4f} rel {rel:.5f}')

    for name, f, args in (('xla_gather', f_xla, (xj, nbrj, wj)),
                          ('key_conv', f_key, (xj, kb, kcol, bj, cj, wj))):
        f(*args).block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        print(f'{name}: {dt * 1e3:.2f} ms')


if __name__ == '__main__':
    main()
