"""REAL-TPU key_conv parity: the Mosaic-compiled kernel (interpret=False) vs
the NumPy searchsorted oracle, at realistic shapes.

The CPU suite runs every case through interpret mode (test_key_conv.py),
which cannot catch Mosaic lowering / layout regressions. This module runs
compiled on the chip and self-skips elsewhere:

    B2M_TPU_TESTS=1 python -m pytest tests/test_key_conv_tpu.py -q

(B2M_TPU_TESTS=1 tells conftest.py to keep the real backend instead of
forcing the virtual CPU mesh.)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from box2mask_tpu.sparse import key_conv as KC
from box2mask_tpu.sparse.device_maps import SENT_KEY

from test_key_conv import floor_keys, make_keys

pytestmark = pytest.mark.skipif(
    jax.default_backend() != 'tpu',
    reason='real-TPU kernel parity (set B2M_TPU_TESTS=1 on a chip host)')


def run_compiled(kernel_size=3, stride_child=False, pad=4096, cin=96,
                 cout=96, seed=0, level=0, spread=60):
    rng = np.random.default_rng(seed)
    scale = 1 << level
    ki, n = make_keys(rng, pad - 101, pad, spread=spread * scale, level=level)
    if stride_child:
        coarse = floor_keys(ki[ki < SENT_KEY], level + 1)
        ko = np.full(pad, int(SENT_KEY), np.int32)
        ko[:len(coarse)] = coarse
    else:
        ko = ki
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    K = 8 if stride_child else kernel_size ** 3
    w = (rng.normal(size=(K, cin, cout)) * 0.1).astype(np.float32)

    offs = KC.offsets_3d(2 if stride_child else kernel_size,
                         stride_child=stride_child)
    deltas = [KC.pack_delta(o, scale) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    bases, counts = KC._host_bases(ki, ko, deltas, groups, win, pad)

    got = KC.key_conv(
        jnp.asarray(x), jnp.asarray(ki[None]),
        jnp.asarray(ko.reshape(-1, 1)), jnp.asarray(bases[None]),
        jnp.asarray(counts[None]), jnp.asarray(w),
        kernel_size=kernel_size, stride_child=stride_child, scale=scale,
        guard=not stride_child, window=win, interpret=False)
    want = KC.key_conv_reference(x, ki[None], ko[None], w,
                                 kernel_size=kernel_size,
                                 stride_child=stride_child, scale=scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
    assert np.abs(want).max() > 0.1


def test_tpu_same_level_3x3_realistic():
    run_compiled(kernel_size=3, pad=4096, cin=96, cout=96, seed=20)


def test_tpu_stem_5x5():
    run_compiled(kernel_size=5, pad=2048, cin=6, cout=32, seed=21, spread=40)


def test_tpu_down_conv():
    run_compiled(stride_child=True, pad=2048, cin=64, cout=128, seed=22,
                 spread=40)


def test_tpu_deep_level_scale8():
    run_compiled(kernel_size=3, level=3, pad=1024, cin=256, cout=256,
                 seed=23, spread=16)


def test_tpu_stem_gather_compiled():
    """Mosaic-compiled search+gather stem (key_conv_stem) vs the oracle AND
    the compiled one-hot kernel at a realistic stem shape (cin=3)."""
    rng = np.random.default_rng(25)
    pad, cin, cout = 4096, 3, 32
    ki, n = make_keys(rng, pad - 101, pad, spread=60)
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    w = (rng.normal(size=(125, cin, cout)) * 0.1).astype(np.float32)
    offs = KC.offsets_3d(5)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW_STEM, pad)
    bases, counts = KC._host_bases(ki, ki, deltas, groups, win, pad)
    got = KC.key_conv_stem(
        jnp.asarray(x), jnp.asarray(ki[None]), jnp.asarray(bases[None]),
        jnp.asarray(counts[None]), jnp.asarray(w), window=win,
        interpret=False)
    want = KC.key_conv_reference(x, ki[None], ki[None], w, kernel_size=5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
    onehot = KC.key_conv(
        jnp.asarray(x), jnp.asarray(ki[None]),
        jnp.asarray(ki.reshape(-1, 1)), jnp.asarray(bases[None]),
        jnp.asarray(counts[None]), jnp.asarray(w), kernel_size=5,
        window=win, interpret=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(onehot),
                               rtol=2e-2, atol=2e-2)
    assert np.abs(want).max() > 0.1


def test_tpu_stem_gather_dw_compiled():
    """Compiled search+gather stem dw (key_conv_stem_dw) vs the compiled
    one-hot dw kernel at the stem shape."""
    rng = np.random.default_rng(26)
    pad, cin, cout = 4096, 3, 32
    ki, n = make_keys(rng, pad - 101, pad, spread=60)
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    g = rng.normal(size=(pad, cout)).astype(np.float32)
    g[n:] = 0
    offs = KC.offsets_3d(5)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW_STEM, pad)
    bases, counts = KC._host_bases(ki, ki, deltas, groups, win, pad)
    got = KC.key_conv_stem_dw(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(ki[None]),
        jnp.asarray(bases[None]), jnp.asarray(counts[None]), window=win,
        interpret=False)
    want = KC.key_conv_dw(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(ki[None]),
        jnp.asarray(ki.reshape(-1, 1)), jnp.asarray(bases[None]),
        jnp.asarray(counts[None]), kernel_size=5, window=win,
        interpret=False)
    w = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2 * w)
    assert w > 0.1


def test_tpu_train_grads_compiled():
    """Compiled custom-VJP backward (dx mirrored kernel + dw accumulator)
    matches the f32 XLA autodiff of the oracle-equivalent gather conv."""
    from box2mask_tpu.sparse import ops

    rng = np.random.default_rng(24)
    pad, cin, cout = 1024, 32, 32
    ki, n = make_keys(rng, pad - 60, pad, spread=40)
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    w = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)

    offs = KC.offsets_3d(3)
    keys64 = ki.astype(np.int64)
    c = np.stack([keys64 >> 20, (keys64 >> 10) & 1023, keys64 & 1023], 1)
    nbr = np.full((pad, 27), pad, np.int32)
    for k, (dx, dy, dz) in enumerate(offs):
        cc = c[:n] + np.array([dx, dy, dz])
        ok = ((cc >= 0) & (cc < 1024)).all(1)
        q = (cc[:, 0] << 20) | (cc[:, 1] << 10) | cc[:, 2]
        pos = np.searchsorted(keys64[:n], q)
        hit = ok & (pos < n) & (keys64[np.minimum(pos, n - 1)] == q)
        nbr[:n, k] = np.where(hit, pos, pad)

    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    bases, counts = KC._host_bases(ki, ki, deltas, groups, win, pad)

    xj, wj = jnp.asarray(x), jnp.asarray(w)
    tgt = jnp.asarray(rng.normal(size=(pad, cout)).astype(np.float32))
    kb = jnp.asarray(ki[None])
    kcol = jnp.asarray(ki.reshape(-1, 1))
    bj, cj = jnp.asarray(bases[None]), jnp.asarray(counts[None])

    def loss_nmap(x, w):
        out = ops.gather_conv(x, jnp.asarray(nbr), w,
                              compute_dtype=jnp.float32)
        return jnp.sum((out - tgt) ** 2)

    def loss_kc(x, w):
        out = KC.key_conv_train(x, kb, kcol, bj, cj, w, 3, 1, True, win)
        return jnp.sum((out - tgt) ** 2)

    v1, (gx1, gw1) = jax.jit(
        jax.value_and_grad(loss_nmap, argnums=(0, 1)))(xj, wj)
    v2, (gx2, gw2) = jax.jit(
        jax.value_and_grad(loss_kc, argnums=(0, 1)))(xj, wj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
    s = np.abs(np.asarray(gx1)).max()
    np.testing.assert_allclose(np.asarray(gx2)[:n], np.asarray(gx1)[:n],
                               rtol=0.05, atol=0.02 * s)
    ws = np.abs(np.asarray(gw1)).max()
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=0.05, atol=0.02 * ws)
