#!/usr/bin/env python
"""Bisect key_conv TPU-vs-oracle mismatches on small cases."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from box2mask_tpu import runtime

runtime.setup()

import jax.numpy as jnp                            # noqa: E402

from box2mask_tpu.sparse import key_conv as KC     # noqa: E402
from box2mask_tpu.sparse.device_maps import SENT_KEY  # noqa: E402


def case(kernel_size=3, doubled=False, pad=512, cin=16, cout=8, seed=0,
         window=None, guard=True, spread=24, n_sub=37):
    rng = np.random.default_rng(seed)
    c = rng.integers(0, spread, size=(pad * 2, 3))
    keys = np.unique((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2])[:pad - n_sub]
    ki = np.full(pad, int(SENT_KEY), np.int32)
    ki[:len(keys)] = keys
    ko = ki
    if doubled:
        x_f = (keys >> 20) >> 1
        y_f = ((keys >> 10) & 1023) >> 1
        z_f = (keys & 1023) >> 1
        coarse = np.unique((x_f << 20) | (y_f << 10) | z_f)
        ko = np.full(pad, int(SENT_KEY), np.int32)
        ko[:len(coarse)] = coarse
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[len(keys):] = 0
    K = 8 if doubled else kernel_size ** 3
    w = (rng.normal(size=(K, cin, cout)) * 0.1).astype(np.float32)
    offs = KC.offsets_3d(2 if doubled else kernel_size, stride_child=doubled)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = window or min(KC.WINDOW, pad)
    bases, counts = KC._host_bases(ki, ko, deltas, groups, win, pad,
                                   doubled=doubled)
    got = KC.key_conv(jnp.asarray(x), jnp.asarray(ki[None]),
                      jnp.asarray(ko.reshape(-1, 1)),
                      jnp.asarray(bases[None]), jnp.asarray(counts[None]),
                      jnp.asarray(w), kernel_size=kernel_size,
                      doubled=doubled, guard=guard, window=win)
    want = KC.key_conv_reference(x, ki[None], ko[None], w,
                                 kernel_size=kernel_size, doubled=doubled)
    d = np.abs(np.asarray(got) - want)
    scale = np.abs(want).max() + 1e-9
    bad = (d > 0.05 * scale).sum()
    rows_bad = np.unique(np.nonzero(d > 0.05 * scale)[0])
    print(f'k={kernel_size} dbl={doubled} pad={pad} win={win} guard={guard} '
          f'spread={spread}: maxdiff {d.max():.4f} rel '
          f'{d.max() / scale:.4f} badrows {len(rows_bad)}/{len(d)} '
          f'firstbad {rows_bad[:6]} chunks {counts.max()}')



def big_case():
    """A/B-scale case checked against the NumPy oracle."""
    from box2mask_tpu.config import get_config
    from box2mask_tpu.datasets import synthetic
    from box2mask_tpu.datasets.voxelize import voxelize_scene
    cfg = get_config(['--config', 'configs/synthetic.txt'])
    scene, _ = synthetic.make_scene(
        seed=0, name='s', num_instances=24, points_per_instance=30000,
        floor_points=300000, wall_points=220000)
    ret = voxelize_scene(scene, cfg)
    c = ret['vox_coords'].astype(np.int64)
    n = len(c)
    pad = ((n + 4095) // 4096) * 4096
    keys = ((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]).astype(np.int32)
    ki = np.full(pad, int(SENT_KEY), np.int32)
    ki[:n] = keys
    rng = np.random.default_rng(0)
    cin = cout = 96
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    w = (rng.normal(size=(27, cin, cout)) * 0.05).astype(np.float32)
    offs = KC.offsets_3d(3)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    bases, counts = KC._host_bases(ki, ki, deltas, groups, win, pad)
    print('counts max', counts.max(), 'mean', counts.mean(axis=0))
    got = np.asarray(KC.key_conv(
        jnp.asarray(x), jnp.asarray(ki[None]), jnp.asarray(ki.reshape(-1, 1)),
        jnp.asarray(bases[None]), jnp.asarray(counts[None]), jnp.asarray(w),
        kernel_size=3))
    want = KC.key_conv_reference(x, ki[None], ki[None], w, kernel_size=3)
    d = np.abs(got - want)
    scale = np.abs(want).max()
    rows_bad = np.unique(np.nonzero(d > 0.05 * scale)[0])
    print(f'big: maxdiff {d.max():.4f} rel {d.max() / scale:.4f} '
          f'badrows {len(rows_bad)}/{len(d)} firstbad {rows_bad[:10]}')
    if len(rows_bad):
        t = rows_bad[0] // KC.TILE
        print('bad tile', t, 'bases', bases[t], 'counts', counts[t])

if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', '1'):
        case()                                   # base: 3^3, 1 chunk mostly
    if which in ('all', '2'):
        case(window=128)                         # multi-chunk
    if which in ('all', '3'):
        case(guard=False)                        # no boundary masks
    if which in ('all', '4'):
        case(doubled=True, seed=3)               # down conv
    if which in ('all', '5'):
        case(kernel_size=5, pad=256, seed=2)     # stem
    if which == 'big':
        big_case()
    if which in ('all', '6'):
        case(spread=60, seed=5)                  # sparser: fewer hits
