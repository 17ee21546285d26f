"""key_conv pallas kernel (interpret mode) vs the NumPy searchsorted oracle.

Level keys follow host_level_keys' convention: every level stores floored
ORIGINAL-scale coords, so level-l offsets are +-2^l per field and the down
conv's child offsets are {0,1}*2^l.
"""

import numpy as np
import jax.numpy as jnp

from box2mask_tpu.sparse import key_conv as KC
from box2mask_tpu.sparse.device_maps import SENT_KEY


def floor_keys(keys, level):
    m = np.int64((1 << level) - 1)
    mask = ~((m << 20) | (m << 10) | m)
    return np.unique(keys.astype(np.int64) & mask).astype(np.int32)


def make_keys(rng, n, pad, spread=24, level=0):
    c = rng.integers(0, spread, size=(n * 2, 3))
    keys = np.unique((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2])
    keys = floor_keys(keys, level)[:n]
    out = np.full(pad, int(SENT_KEY), np.int32)
    out[:len(keys)] = keys
    return out, len(keys)


def run_case(kernel_size=3, stride_child=False, B=1, pad=512, cin=16, cout=8,
             seed=0, level=0, window=None, spread=24):
    rng = np.random.default_rng(seed)
    scale = 1 << level
    keys_in, keys_out, xs = [], [], []
    for b in range(B):
        ki, n = make_keys(rng, pad - 37 * (b + 1), pad,
                          spread=spread * scale, level=level)
        keys_in.append(ki)
        if stride_child:
            coarse = floor_keys(ki[ki < SENT_KEY], level + 1)
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
    K = 8 if stride_child else kernel_size ** 3
    w = (rng.normal(size=(K, cin, cout)) * 0.1).astype(np.float32)

    offs = KC.offsets_3d(2 if stride_child else kernel_size,
                         stride_child=stride_child)
    deltas = [KC.pack_delta(o, scale) for o in offs]
    groups = KC.group_by_dx(offs)
    win = window or min(KC.WINDOW, pad)
    bases = np.zeros((B, pad // KC.TILE, len(groups)), np.int32)
    counts = np.zeros_like(bases)
    for b in range(B):
        bases[b], counts[b] = KC._host_bases(
            keys_in_b[b], keys_out_b[b], deltas, groups, win, pad)

    got = KC.key_conv(
        jnp.asarray(x), jnp.asarray(keys_in_b),
        jnp.asarray(keys_out_b.reshape(-1, 1)), jnp.asarray(bases),
        jnp.asarray(counts), jnp.asarray(w),
        kernel_size=kernel_size, stride_child=stride_child, scale=scale,
        guard=not stride_child, window=win, interpret=True)
    want = KC.key_conv_reference(x, keys_in_b, keys_out_b, w,
                                 kernel_size=kernel_size,
                                 stride_child=stride_child, scale=scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
    assert np.abs(want).max() > 0.1       # non-trivial case


def test_same_level_3x3():
    run_case(kernel_size=3)


def test_same_level_batch2():
    run_case(kernel_size=3, B=2, seed=1)


def test_same_level_scale2():
    run_case(kernel_size=3, level=1, pad=256, seed=4)


def test_stem_5x5():
    run_case(kernel_size=5, pad=256, seed=2)


def test_down_conv():
    run_case(stride_child=True, seed=3)


def test_down_conv_scale2():
    run_case(stride_child=True, level=1, pad=256, seed=6)


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
    w = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)
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


def stem_gather_case(B=1, pad=512, cin=3, cout=32, seed=11, window=None,
                     spread=24):
    """key_conv_stem (search+gather kernel) vs the NumPy oracle AND the
    one-hot kernel. spread=24 includes coords 0/1 so dy/dz=-2 borrows
    exercise the axis guards."""
    rng = np.random.default_rng(seed)
    keys_in, xs = [], []
    for b in range(B):
        ki, n = make_keys(rng, pad - 37 * (b + 1), pad, spread=spread)
        keys_in.append(ki)
        x = rng.normal(size=(pad, cin)).astype(np.float32)
        x[n:] = 0
        xs.append(x)
    keys_in_b = np.stack(keys_in)
    x = np.concatenate(xs, axis=0)
    w = (rng.normal(size=(125, cin, cout)) * 0.1).astype(np.float32)
    offs = KC.offsets_3d(5)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = window or min(KC.WINDOW_STEM, pad)
    bases = np.zeros((B, pad // KC.TILE, len(groups)), np.int32)
    counts = np.zeros_like(bases)
    for b in range(B):
        bases[b], counts[b] = KC._host_bases(
            keys_in_b[b], keys_in_b[b], deltas, groups, win, pad)
    got = KC.key_conv_stem(
        jnp.asarray(x), jnp.asarray(keys_in_b), jnp.asarray(bases),
        jnp.asarray(counts), jnp.asarray(w), window=win, interpret=True)
    want = KC.key_conv_reference(x, keys_in_b, keys_in_b, w, kernel_size=5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
    assert np.abs(want).max() > 0.1
    return x, keys_in_b, bases, counts, w, win, counts


def test_stem_gather_matches_oracle():
    stem_gather_case()


def test_stem_gather_batch2_cin6():
    stem_gather_case(B=2, cin=6, cout=16, seed=12)


def test_stem_gather_multi_chunk():
    """Window forced narrow so dx-group spans need several chunks; hits
    merge idempotently across overlapping chunks (no shift masking)."""
    *_, counts = stem_gather_case(pad=1024, seed=13, window=128, spread=60)
    assert counts.max() > 1


def test_stem_gather_train_matches_onehot_train():
    """Forward + dw of key_conv_stem_train vs key_conv_train at the stem
    site (dx is zeros by design: the stem input is network input)."""
    import jax
    x, keys_in_b, bases, counts, w, win, _ = stem_gather_case(seed=14)
    xj, kj = jnp.asarray(x), jnp.asarray(keys_in_b)
    bj, cj, wj = jnp.asarray(bases), jnp.asarray(counts), jnp.asarray(w)

    def f_stem(w_):
        return (KC.key_conv_stem_train(xj, kj, bj, cj, w_, win) ** 2).sum()

    def f_oh(w_):
        return (KC.key_conv_train(xj, kj, kj.reshape(-1, 1), bj, cj, w_,
                                  5, 1, True, win) ** 2).sum()

    out_s = KC.key_conv_stem_train(xj, kj, bj, cj, wj, win)
    out_o = KC.key_conv_train(xj, kj, kj.reshape(-1, 1), bj, cj, wj,
                              5, 1, True, win)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_o),
                               rtol=2e-2, atol=2e-2)
    dw_s = jax.grad(f_stem)(wj)
    dw_o = jax.grad(f_oh)(wj)
    np.testing.assert_allclose(np.asarray(dw_s), np.asarray(dw_o),
                               rtol=2e-2, atol=2e-2)


def test_host_conv_plans_shapes():
    rng = np.random.default_rng(8)
    keys0, _ = make_keys(rng, 400, 512)
    levels = [keys0]
    for l in range(1, 8):
        fl = floor_keys(levels[-1][levels[-1] < SENT_KEY], l)
        padded = np.full(256, int(SENT_KEY), np.int32)
        padded[:min(len(fl), 256)] = fl[:256]
        levels.append(padded)
    plans = KC.host_conv_plans(levels)
    t0 = 512 // KC.TILE
    t1 = 256 // KC.TILE
    assert plans['kc3_base0'].shape == (t0, 3)
    assert plans['kc5_base0'].shape == (t0, 5)
    assert plans['kcd_base0'].shape == (t1, 2)    # coarse tiles at level 1
    for l in range(1, 8):
        assert plans[f'kc3_base{l}'].shape == (t1, 3)


def test_train_grads_match_nmap_path():
    """value_and_grad through key_conv_train / key_conv_down_train must match
    the XLA nmap gather_conv gradients (same math, different machinery)."""
    import jax
    from box2mask_tpu.sparse import ops

    rng = np.random.default_rng(11)
    pad, cin, cout = 256, 8, 8
    ki, n = make_keys(rng, pad - 30, pad)
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    w = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)

    # nmap for the reference path
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

    def loss_nmap(x, w):
        out = ops.gather_conv(x, jnp.asarray(nbr), w,
                              compute_dtype=jnp.float32)
        return jnp.sum((out - tgt) ** 2)

    kb = jnp.asarray(ki[None])
    kcol = jnp.asarray(ki.reshape(-1, 1))
    bj, cj = jnp.asarray(bases[None]), jnp.asarray(counts[None])

    def loss_kc(x, w):
        out = KC.key_conv_train(x, kb, kcol, bj, cj, w, 3, 1, True, win)
        return jnp.sum((out - tgt) ** 2)

    v1, (gx1, gw1) = jax.value_and_grad(loss_nmap, argnums=(0, 1))(xj, wj)
    v2, (gx2, gw2) = jax.value_and_grad(loss_kc, argnums=(0, 1))(xj, wj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
    scale = np.abs(np.asarray(gx1)).max()
    np.testing.assert_allclose(np.asarray(gx2)[:n], np.asarray(gx1)[:n],
                               rtol=0.05, atol=0.02 * scale)
    ws = np.abs(np.asarray(gw1)).max()
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=0.05, atol=0.02 * ws)


def test_down_train_grads_match():
    import jax
    from box2mask_tpu.sparse import ops

    rng = np.random.default_rng(12)
    pad, cin, cout = 256, 8, 8
    ki, n = make_keys(rng, pad - 30, pad)
    fine = ki[ki < SENT_KEY]
    coarse = floor_keys(fine, 1)
    ko = np.full(pad, int(SENT_KEY), np.int32)
    ko[:len(coarse)] = coarse
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    w = (rng.normal(size=(8, cin, cout)) * 0.1).astype(np.float32)

    offs = KC.offsets_3d(2, stride_child=True)
    keys64 = ki.astype(np.int64)
    nbr = np.full((pad, 8), pad, np.int32)    # down map: coarse row -> fine
    nc = len(coarse)
    co64 = coarse.astype(np.int64)
    for k, (dx, dy, dz) in enumerate(offs):
        q = co64 + KC.pack_delta((dx, dy, dz))
        pos = np.searchsorted(keys64[:n], q)
        hit = (pos < n) & (keys64[np.minimum(pos, n - 1)] == q)
        nbr[:nc, k] = np.where(hit, pos, pad)

    # up maps: parent of each fine voxel + weight slot (bit 0 per field)
    m = np.int64(1)
    parent_key = keys64[:n] & ~((m << 20) | (m << 10) | m)
    par = np.full(pad, pad, np.int32)
    par[:n] = np.searchsorted(co64, parent_key)
    widx = np.zeros(pad, np.int32)
    widx[:n] = (((keys64[:n] >> 20) & 1) * 4 + ((keys64[:n] >> 10) & 1) * 2
                + (keys64[:n] & 1))

    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    bases, counts = KC._host_bases(ki, ko, deltas, groups, win, pad)

    xj, wj = jnp.asarray(x), jnp.asarray(w)
    tgt = jnp.asarray(rng.normal(size=(pad, cout)).astype(np.float32))

    def loss_nmap(x, w):
        out = ops.gather_conv(x, jnp.asarray(nbr), w,
                              compute_dtype=jnp.float32)
        return jnp.sum((out - tgt) ** 2)

    kb = jnp.asarray(ki[None])
    kcol = jnp.asarray(ko.reshape(-1, 1))
    bj, cj = jnp.asarray(bases[None]), jnp.asarray(counts[None])

    def loss_kc(x, w):
        out = KC.key_conv_down_train(x, kb, kcol, bj, cj, jnp.asarray(par),
                                     jnp.asarray(widx), w, 1, win)
        return jnp.sum((out - tgt) ** 2)

    v1, (gx1, gw1) = jax.value_and_grad(loss_nmap, argnums=(0, 1))(xj, wj)
    v2, (gx2, gw2) = jax.value_and_grad(loss_kc, argnums=(0, 1))(xj, wj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
    s = np.abs(np.asarray(gx1)).max()
    np.testing.assert_allclose(np.asarray(gx2)[:n], np.asarray(gx1)[:n],
                               rtol=0.05, atol=0.02 * s)
    ws = np.abs(np.asarray(gw1)).max()
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=0.05, atol=0.02 * ws)


def test_down_plan_train_grads_match():
    """key_conv_down_plan_train (stride_parent-kernel backward over the up
    plans — the variant kc batches use) must match the up_parent/up_widx
    variant in value and gradients."""
    import jax

    rng = np.random.default_rng(14)
    pad, cin, cout = 256, 8, 8
    ki, n = make_keys(rng, pad - 30, pad)
    fine = ki[ki < SENT_KEY]
    coarse = floor_keys(fine, 1)
    ko = np.full(pad, int(SENT_KEY), np.int32)
    ko[:len(coarse)] = coarse
    nc = len(coarse)
    keys64 = ki.astype(np.int64)
    co64 = coarse.astype(np.int64)
    m = np.int64(1)
    parent_key = keys64[:n] & ~((m << 20) | (m << 10) | m)
    par = np.full(pad, pad, np.int32)
    par[:n] = np.searchsorted(co64, parent_key)
    widx = np.zeros(pad, np.int32)
    widx[:n] = (((keys64[:n] >> 20) & 1) * 4 + ((keys64[:n] >> 10) & 1) * 2
                + (keys64[:n] & 1))
    x = rng.normal(size=(pad, cin)).astype(np.float32)
    x[n:] = 0
    w = (rng.normal(size=(8, cin, cout)) * 0.1).astype(np.float32)

    offs = KC.offsets_3d(2, stride_child=True)
    dd = [KC.pack_delta(o) for o in offs]
    du = [-d for d in dd]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    b_d, c_d = KC._host_bases(ki, ko, dd, groups, win, pad)
    win_u = min(KC.WINDOW_UP, pad)
    b_u, c_u = KC._host_bases(ko, ki, du, groups, win_u, pad)

    xj, wj = jnp.asarray(x), jnp.asarray(w)
    tgt = jnp.asarray(rng.normal(size=(pad, cout)).astype(np.float32))
    kb = jnp.asarray(ki[None])
    kcol = jnp.asarray(ko.reshape(-1, 1))

    def loss_old(x, w):
        out = KC.key_conv_down_train(
            x, kb, kcol, jnp.asarray(b_d[None]), jnp.asarray(c_d[None]),
            jnp.asarray(par), jnp.asarray(widx), w, 1, win)
        return jnp.sum((out - tgt) ** 2)

    def loss_plan(x, w):
        out = KC.key_conv_down_plan_train(
            x, kb, kcol, jnp.asarray(b_d[None]), jnp.asarray(c_d[None]),
            jnp.asarray(b_u[None]), jnp.asarray(c_u[None]), w, 1, win)
        return jnp.sum((out - tgt) ** 2)

    v1, (gx1, gw1) = jax.value_and_grad(loss_old, argnums=(0, 1))(xj, wj)
    v2, (gx2, gw2) = jax.value_and_grad(loss_plan, argnums=(0, 1))(xj, wj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    s = np.abs(np.asarray(gx1)).max()
    np.testing.assert_allclose(np.asarray(gx2)[:n], np.asarray(gx1)[:n],
                               rtol=0.05, atol=0.02 * s)
    ws = np.abs(np.asarray(gw1)).max()
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=0.02, atol=0.01 * ws)


def test_up_train_matches_up_conv():
    """key_conv_up_train (stride_parent transpose conv) must match
    ops.up_conv's einsum+gather in value AND gradients — it replaces it on
    kc batches (round-4: up L1->L0 measured 20 ms einsum+gather vs windowed
    kernel, scripts/profile_levels.py)."""
    import jax
    from box2mask_tpu.sparse import ops

    rng = np.random.default_rng(13)
    pad, cin, cout = 256, 8, 8
    ki, n = make_keys(rng, pad - 30, pad)
    fine = ki[ki < SENT_KEY]
    coarse = floor_keys(fine, 1)
    ko = np.full(pad, int(SENT_KEY), np.int32)
    ko[:len(coarse)] = coarse
    nc = len(coarse)
    keys64 = ki.astype(np.int64)
    co64 = coarse.astype(np.int64)

    m = np.int64(1)
    parent_key = keys64[:n] & ~((m << 20) | (m << 10) | m)
    par = np.full(pad, pad, np.int32)
    par[:n] = np.searchsorted(co64, parent_key)
    widx = np.zeros(pad, np.int32)
    widx[:n] = (((keys64[:n] >> 20) & 1) * 4 + ((keys64[:n] >> 10) & 1) * 2
                + (keys64[:n] & 1))

    x = rng.normal(size=(pad, cin)).astype(np.float32)   # coarse features
    x[nc:] = 0
    w = (rng.normal(size=(8, cin, cout)) * 0.1).astype(np.float32)

    offs = KC.offsets_3d(2, stride_child=True)
    du = [-KC.pack_delta(o) for o in offs]               # up: fine -> parent
    dd = [KC.pack_delta(o) for o in offs]                # down (backward)
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    b_u, c_u = KC._host_bases(ko, ki, du, groups, win, pad)
    b_d, c_d = KC._host_bases(ki, ko, dd, groups, win, pad)

    xj, wj = jnp.asarray(x), jnp.asarray(w)
    tgt = jnp.asarray(rng.normal(size=(pad, cout)).astype(np.float32))

    def loss_ref(x, w):
        out = ops.up_conv(x, jnp.asarray(par), jnp.asarray(widx), w,
                          compute_dtype=jnp.float32)
        return jnp.sum((out - tgt) ** 2)

    def loss_kc(x, w):
        out = KC.key_conv_up_train(
            x, jnp.asarray(ko[None]), jnp.asarray(ki.reshape(-1, 1)),
            jnp.asarray(b_u[None]), jnp.asarray(c_u[None]),
            jnp.asarray(ki[None]), jnp.asarray(ko.reshape(-1, 1)),
            jnp.asarray(b_d[None]), jnp.asarray(c_d[None]), w, 1, win)
        return jnp.sum((out - tgt) ** 2)

    v1, (gx1, gw1) = jax.value_and_grad(loss_ref, argnums=(0, 1))(xj, wj)
    v2, (gx2, gw2) = jax.value_and_grad(loss_kc, argnums=(0, 1))(xj, wj)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
    s = np.abs(np.asarray(gx1)).max()
    np.testing.assert_allclose(np.asarray(gx2)[:nc], np.asarray(gx1)[:nc],
                               rtol=0.05, atol=0.02 * s)
    ws = np.abs(np.asarray(gw1)).max()
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=0.05, atol=0.02 * ws)


def test_key_conv_under_shard_map():
    """key_conv inside a shard_map DP step (per-device local windows) matches
    per-device serial execution — the --key_conv on multi-chip path."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip('needs 2 devices')

    rng = np.random.default_rng(13)
    pad, cin, cout = 256, 8, 8
    D = 2
    kis, xs = [], []
    for d in range(D):
        ki, n = make_keys(rng, pad - 20 * (d + 1), pad)
        kis.append(ki)
        x = rng.normal(size=(pad, cin)).astype(np.float32)
        x[n:] = 0
        xs.append(x)
    w = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)
    offs = KC.offsets_3d(3)
    deltas = [KC.pack_delta(o) for o in offs]
    groups = KC.group_by_dx(offs)
    win = min(KC.WINDOW, pad)
    bases = np.stack([KC._host_bases(k, k, deltas, groups, win, pad)[0]
                      for k in kis])
    counts = np.stack([KC._host_bases(k, k, deltas, groups, win, pad)[1]
                       for k in kis])

    mesh = Mesh(np.array(jax.devices()[:D]), ('data',))

    def dev_step(x, kb, kcol, b, c, w):
        return KC.key_conv(x[0], kb, kcol[0].reshape(-1, 1),
                           b, c, w, kernel_size=3, interpret=True)[None]

    f = jax.jit(shard_map(
        dev_step, mesh=mesh,
        in_specs=(P('data'), P('data'), P('data'), P('data'), P('data'), P()),
        out_specs=P('data'), check_vma=False))
    out = np.asarray(f(
        jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(kis)),
        jnp.asarray(np.stack(kis)), jnp.asarray(bases),
        jnp.asarray(counts), jnp.asarray(w)))
    for d in range(D):
        want = KC.key_conv_reference(xs[d], kis[d][None], kis[d][None], w,
                                     kernel_size=3)
        np.testing.assert_allclose(out[d], want, rtol=0.05, atol=0.05)
