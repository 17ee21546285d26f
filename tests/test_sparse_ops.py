import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2mask_tpu.sparse import coords as C
from box2mask_tpu.sparse import ops


def dense_oracle_conv(out_coords, feats, w, offsets, in_coords=None):
    """out[v] = sum_k feats[at coord v + off_k] @ w[k], missing -> 0."""
    if in_coords is None:
        in_coords = out_coords
    table = {tuple(c): i for i, c in enumerate(in_coords)}
    out = np.zeros((len(out_coords), w.shape[2]), np.float32)
    for v, c in enumerate(out_coords):
        for k, off in enumerate(offsets):
            j = table.get(tuple(c + off))
            if j is not None:
                out[v] += feats[j] @ w[k]
    return out


@pytest.mark.parametrize('ksize', [3, 5])
def test_gather_conv_matches_oracle(ksize):
    rng = np.random.default_rng(0)
    coords = np.unique(rng.integers(0, 8, size=(300, 3)), axis=0)
    keys = np.unique(C.pack(coords))
    coords = C._unpack(keys).astype(np.int32)
    V = len(coords)
    cin, cout = 4, 5
    feats = rng.normal(size=(V, cin)).astype(np.float32)
    offs = C.kernel_offsets(ksize, 1)
    w = rng.normal(size=(len(offs), cin, cout)).astype(np.float32) * 0.1
    nbr = C.neighbor_map(coords, keys, offs)
    # pad: sentinel row == V_pad
    Vp = V + 7
    nbr_p = np.where(nbr < 0, Vp, nbr)
    nbr_p = np.concatenate([nbr_p, np.full((Vp - V, len(offs)), Vp)], axis=0)
    x = np.concatenate([feats, np.zeros((Vp - V, cin), np.float32)])
    got = np.asarray(ops.gather_conv(jnp.array(x), jnp.array(nbr_p), jnp.array(w),
                                     compute_dtype=jnp.float32))
    want = dense_oracle_conv(coords, feats, w, offs)
    np.testing.assert_allclose(got[:V], want, rtol=1e-4, atol=1e-4)
    assert np.abs(got[V:]).max() == 0


def test_down_and_up_conv_shapes_and_values():
    rng = np.random.default_rng(1)
    coords = np.unique(rng.integers(0, 10, size=(200, 3)), axis=0)
    pyr = C.build_scene_pyramid(coords)
    b = C.batch_pyramids([pyr], vox_bucket=64)
    V0p = b['coords0'].shape[0]
    V1p = b['coords1'].shape[0]
    cin, cout = 3, 4
    x = rng.normal(size=(V0p, cin)).astype(np.float32)
    x[~b['valid0']] = 0
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)

    # down conv oracle
    got = np.asarray(ops.gather_conv(jnp.array(x), jnp.array(b['down0']),
                                     jnp.array(w), compute_dtype=jnp.float32))
    n0, n1 = int(b['num0']), int(b['num1'])
    want = dense_oracle_conv(
        b['coords1'][:n1], x[:n0], w, C.kernel_offsets(2, 1),
        in_coords=b['coords0'][:n0])
    np.testing.assert_allclose(got[:n1], want, rtol=1e-4, atol=1e-4)

    # up conv: out[v] = x_coarse[parent[v]] @ w[widx[v]]
    xc = rng.normal(size=(V1p, cin)).astype(np.float32)
    up = np.asarray(ops.up_conv(jnp.array(xc), jnp.array(b['up_parent0']),
                                jnp.array(b['up_widx0']), jnp.array(w),
                                compute_dtype=jnp.float32))
    assert up.shape == (V0p, cout)
    for v in [0, 1, n0 // 2, n0 - 1]:
        p, k = b['up_parent0'][v], b['up_widx0'][v]
        np.testing.assert_allclose(up[v], xc[p] @ w[k], rtol=1e-4, atol=1e-4)
    # padded rows -> zero
    assert np.abs(up[n0:]).max() == 0


def test_masked_moments():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(50, 6)).astype(np.float32)
    valid = np.arange(50) < 37
    x[~valid] = 999.0  # garbage in padding must not leak
    mean, var, n = ops.masked_moments(jnp.array(x), jnp.array(valid), jnp.int32(37))
    np.testing.assert_allclose(np.asarray(mean), x[:37].mean(0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), x[:37].var(0), rtol=1e-4, atol=1e-4)
    assert float(n) == 37


def test_segment_pool():
    rng = np.random.default_rng(3)
    V, S = 40, 5
    x = rng.normal(size=(V, 3)).astype(np.float32)
    ids = rng.integers(0, S, size=V)
    ids[30:] = S  # padding -> trash segment
    avg = np.asarray(ops.segment_pool(jnp.array(x), jnp.array(ids), S, 'avg'))
    mx = np.asarray(ops.segment_pool(jnp.array(x), jnp.array(ids), S, 'max'))
    for s in range(S):
        m = ids[:30] == s
        if m.sum():
            np.testing.assert_allclose(avg[s], x[:30][m].mean(0), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(mx[s], x[:30][m].max(0), rtol=1e-5, atol=1e-5)
