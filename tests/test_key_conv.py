"""key_conv pallas kernel (interpret mode) vs the NumPy searchsorted oracle
and vs the nmap gather_conv path on real voxelized scenes."""

import numpy as np
import jax.numpy as jnp
import pytest

from box2mask_tpu.sparse import key_conv as KC
from box2mask_tpu.sparse.device_maps import SENT_KEY


def make_keys(rng, n, pad, spread=24):
    """Sorted unique packed keys from random small coords (dense enough that
    many neighbors exist, incl. axis-0 boundaries)."""
    c = rng.integers(0, spread, size=(n * 2, 3))
    keys = np.unique((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2])[:n]
    out = np.full(pad, int(SENT_KEY), np.int32)
    out[:len(keys)] = keys
    return out, len(keys)


def run_case(kernel_size=3, doubled=False, B=1, pad=512, cin=16, cout=8,
             seed=0):
    rng = np.random.default_rng(seed)
    keys_in, keys_out, xs = [], [], []
    for b in range(B):
        ki, n = make_keys(rng, pad - 37 * (b + 1), pad)
        keys_in.append(ki)
        if doubled:
            fine = ki[ki < SENT_KEY]
            coarse = np.unique((fine >> 1) & ~np.int32((1 << 20) | (1 << 10)
                                                       | 0))
            # coarse key fields = floor(fine fields / 2): strip the low bit
            # of every field
            x_f = (fine >> 20) >> 1
            y_f = ((fine >> 10) & 1023) >> 1
            z_f = (fine & 1023) >> 1
            coarse = np.unique((x_f << 20) | (y_f << 10) | z_f)
            ko = np.full(pad, int(SENT_KEY), np.int32)
            ko[:len(coarse)] = coarse
            keys_out.append(ko)
        else:
            keys_out.append(ki)
        x = rng.normal(size=(pad, cin)).astype(np.float32)
        x[n:] = 0
        xs.append(x)
    keys_in_b = np.stack(keys_in)
    keys_out_b = np.stack(keys_out)
    x = np.concatenate(xs, axis=0)
    K = 8 if doubled else kernel_size ** 3
    w = rng.normal(size=(K, cin, cout)).astype(np.float32) * 0.1

    offs = KC.offsets_3d(2 if doubled else kernel_size, stride_child=doubled)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    bases = np.zeros((B, pad // KC.TILE, len(groups)), np.int32)
    counts = np.zeros_like(bases)
    for b in range(B):
        bases[b], counts[b] = KC._host_bases(
            keys_in_b[b], keys_out_b[b], deltas, groups, win, pad,
            doubled=doubled)

    got = KC.key_conv(
        jnp.asarray(x), jnp.asarray(keys_in_b),
        jnp.asarray(keys_out_b.reshape(-1, 1)), jnp.asarray(bases),
        jnp.asarray(counts), jnp.asarray(w),
        kernel_size=kernel_size, doubled=doubled, interpret=True)
    want = KC.key_conv_reference(x, keys_in_b, keys_out_b, w,
                                 kernel_size=kernel_size, doubled=doubled)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
    assert np.abs(want).max() > 0.1       # non-trivial case


def test_same_level_3x3():
    run_case(kernel_size=3)


def test_same_level_batch2():
    run_case(kernel_size=3, B=2, seed=1)


def test_stem_5x5():
    run_case(kernel_size=5, pad=256, seed=2)


def test_down_conv():
    run_case(doubled=True, seed=3)


def test_narrow_window_multi_chunk():
    """Scene spread >> window so x-offsets need several chunks per tile."""
    rng = np.random.default_rng(7)
    pad, cin, cout = 1024, 8, 8
    c = rng.integers(0, 100, size=(3000, 3))
    keys = np.unique((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2])[:pad - 50]
    keys_in = np.full(pad, int(SENT_KEY), np.int32)
    keys_in[:len(keys)] = keys
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[len(keys):] = 0
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    offs = KC.offsets_3d(3)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = 128                               # force multi-chunk coverage
    bases, counts = KC._host_bases(keys_in, keys_in, deltas, groups, win, pad)
    assert counts.max() > 1
    kb = keys_in[None]
    got = KC.key_conv(jnp.asarray(x), jnp.asarray(kb),
                      jnp.asarray(kb.reshape(-1, 1)),
                      jnp.asarray(bases[None]), jnp.asarray(counts[None]),
                      jnp.asarray(w), kernel_size=3, window=win,
                      interpret=True)
    want = KC.key_conv_reference(x, kb, kb, w, kernel_size=3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
