"""Pallas fused gather-GEMM conv vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2mask_tpu.sparse import coords as C
from box2mask_tpu.sparse import ops
from box2mask_tpu.sparse import pallas_conv as PC


def make_case(seed=0, n=600, cin=8, cout=16):
    rng = np.random.default_rng(seed)
    coords = np.unique(rng.integers(0, 12, size=(n, 3)), axis=0)
    pyr = C.build_scene_pyramid(coords)
    b = C.batch_pyramids([pyr], vox_bucket=PC.TILE)
    V = b['coords0'].shape[0]
    x = rng.normal(size=(V, cin)).astype(np.float32)
    x[~b['valid0']] = 0
    w = (rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)
    return b, x, w


def test_pallas_conv_matches_xla():
    b, x, w = make_case()
    want = np.asarray(ops.gather_conv(jnp.asarray(x), jnp.asarray(b['nmap3_0']),
                                      jnp.asarray(w),
                                      compute_dtype=jnp.bfloat16))
    got = np.asarray(PC._pallas_forward(jnp.asarray(x),
                                        jnp.asarray(b['nmap3_0']),
                                        jnp.asarray(w), interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    n = int(b['num0'])
    assert np.abs(got[n:]).max() == 0


def test_pallas_gather_rows_matches_take():
    b, x, w = make_case(seed=2, cin=16)
    idx = b['up_parent0']  # monotone parent rows into level 1
    V1 = b['coords1'].shape[0]
    x1 = np.random.default_rng(3).normal(size=(V1, 16)).astype(np.float32)
    got = np.asarray(PC.gather_rows(jnp.asarray(x1), jnp.asarray(idx),
                                    interpret=True))
    xz = np.concatenate([x1, np.zeros((1, 16), np.float32)])
    want = xz[np.minimum(idx, V1)]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pallas_conv_monotonic_indices_assumption():
    """Valid entries of each offset column must be strictly increasing —
    the property the window kernel relies on."""
    b, x, w = make_case(seed=1)
    nbr = b['nmap3_0']
    V = x.shape[0]
    n = int(b['num0'])
    for k in range(27):
        col = nbr[:n, k]
        vals = col[col < V]
        assert (np.diff(vals) > 0).all()
