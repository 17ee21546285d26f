"""Spatial sharding (one scene across the mesh) vs the single-device forward.

Exact-equality check of the halo-exchanged conv stack on a 4-device virtual
mesh against the plain gather_conv chain on one device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from box2mask_tpu.parallel import spatial
from box2mask_tpu.parallel.mesh import Mesh
from box2mask_tpu.sparse import ops
from box2mask_tpu.sparse.coords import build_scene_pyramid, kernel_offsets, pack


def random_scene(n, hi=40, seed=0):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, hi, size=(n, 3)), axis=0).astype(np.int32)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 devices')
def test_spatial_conv_stack_matches_single_device():
    D = 4
    c = random_scene(2500, seed=5)
    n = len(c)
    plan = spatial.plan_shards(c, D, kernel_size=3, bucket=128)
    pad, H = plan['pad'], plan['halo']

    rng = np.random.default_rng(0)
    C = 16
    x = rng.normal(size=(n, C)).astype(np.float32)
    layers = 3
    ws = (rng.normal(size=(layers, 27, C, C)) * 0.1).astype(np.float32)

    # ---- single-device oracle: plain gather_conv chain over the full scene
    keys = pack(c)
    offs = kernel_offsets(3, 1)
    nmap_full = np.full((n, 27), n, np.int32)
    for k, off in enumerate(offs):
        q = pack(c + off[None, :])
        pos = np.searchsorted(keys, q)
        hit = (pos < n) & (keys[np.minimum(pos, n - 1)] == q)
        nmap_full[:, k] = np.where(hit, pos, n)
    ref = jnp.asarray(x)
    for i in range(layers):
        ref = ops.gather_conv(ref, jnp.asarray(nmap_full),
                              jnp.asarray(ws[i]),
                              compute_dtype=jnp.float32)
        if i + 1 < layers:
            ref = jax.nn.relu(ref)
    ref = np.asarray(ref)

    # ---- sharded run
    per = -(-n // D)
    x_shards = np.zeros((D, pad, C), np.float32)
    for d in range(D):
        lo, hi = d * per, min((d + 1) * per, n)
        x_shards[d, :hi - lo] = x[lo:hi]

    mesh = Mesh(np.array(jax.devices()[:D]), (spatial.AXIS,))
    stack = spatial.make_spatial_conv_stack(mesh, layers)
    out = np.asarray(stack(jnp.asarray(x_shards), jnp.asarray(plan['nmap']),
                           jnp.asarray(plan['slab_left']),
                           jnp.asarray(plan['slab_right']), jnp.asarray(ws)))
    got = np.concatenate([out[d][:int(plan['num'][d])] for d in range(D)])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_plan_shards_halo_geometry():
    c = random_scene(1200, seed=7)
    D = 3
    plan = spatial.plan_shards(c, D, kernel_size=3, bucket=128)
    n = len(c)
    per = -(-n // D)
    assert plan['num'].sum() == n
    # every local row's neighbors resolve inside the extended space
    assert (plan['nmap'] <= plan['halo'] + plan['pad'] + plan['halo']).all()
    # interior shard receives a non-trivial halo from both sides
    if D >= 3:
        assert (plan['slab_right'][0] < plan['pad']).any()
        assert (plan['slab_left'][1] < plan['pad']).any()
