"""Spatial sharding: ONE scene's voxels split across the device mesh.

The reference cannot fit very large scenes on one GPU and downsamples instead
(config_loader.py:33-35, dataprocessing/arkitscenes.py:351-354). The
TPU-native answer keeps every voxel and splits the scene itself:

  * voxels are key-sorted (x-major), so a contiguous row range is a slab in
    x — shard the sorted rows into D balanced contiguous chunks,
  * a k^3 conv at level l needs neighbors within +-(k//2)*2^l of the slab
    boundary; in sorted order those are the rows just before/after the chunk
    — a HALO of up to H rows on each side,
  * per-shard neighbor maps are built on the host over the extended row space
    [halo_left | local | halo_right] (missing == ext size, the zero row),
  * at every conv, each device sends its boundary rows to its neighbors with
    `jax.lax.ppermute` (one ICI hop) and gathers from the extended array.

This module implements the mechanism — sharding plan, halo maps, and a
halo-exchanged conv stack — with exact-equality tests against the
single-device forward on a virtual mesh (tests/test_spatial.py). Scaling the
full U-Net this way composes the same pieces per level (shard levels 0..L
where the voxel counts are large, all-gather the small coarse levels); the
stack here is the level-0 pattern that dominates the compute.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from box2mask_tpu.sparse import ops
from box2mask_tpu.sparse.coords import kernel_offsets, pack, round_up

AXIS = 'space'


def plan_shards(vox_coords, n_shards, kernel_size=3, halo_pad=None,
                bucket=256):
    """Split a key-sorted scene into contiguous shards with halo maps.

    Returns a dict of stacked per-shard arrays:
      nmap: (D, pad, K) int32 neighbor maps into the extended row space
            [0,H) = halo from the left neighbor shard, [H, H+pad) = local,
            [H+pad, H+2H...) = halo from the right; missing == H+pad+H,
      slab_left / slab_right: (D, H) int32 local rows each shard contributes
            to its right/left neighbor's halo (sentinel pad for none),
      valid: (D, pad) bool, num: (D,) int32.
    """
    c = np.asarray(vox_coords)
    keys = pack(c)
    assert (np.diff(keys) > 0).all(), 'vox_coords must be key-sorted unique'
    n = len(keys)
    D = n_shards
    per = -(-n // D)
    bounds = [min(i * per, n) for i in range(D + 1)]
    half = kernel_size // 2
    offs = kernel_offsets(kernel_size, 1)
    pad = max(round_up(per, bucket), bucket)

    # halo extent: rows within +-half x-planes of the boundary key
    if halo_pad is None:
        halo_pad = pad
    H = halo_pad

    nmaps = np.full((D, pad, len(offs)), H + pad + H, np.int32)
    slab_l = np.full((D, H), pad, np.int32)   # rows sent to the LEFT nbr
    slab_r = np.full((D, H), pad, np.int32)   # rows sent to the RIGHT nbr
    valid = np.zeros((D, pad), bool)
    halo_lo = np.zeros(D, np.int64)
    halo_hi = np.zeros(D, np.int64)
    for d in range(D):
        lo, hi = bounds[d], bounds[d + 1]
        nd = hi - lo
        valid[d, :nd] = True
        # halo source ranges in the GLOBAL sorted order; the largest key
        # delta of a k^3 offset is half*(1<<2S) + half*(1<<S) + half with
        # coords.pack's field shift S
        from box2mask_tpu.sparse.coords import _SHIFT
        span = np.int64(half) * ((1 << (2 * _SHIFT)) + (1 << _SHIFT) + 1)
        hl_lo = np.searchsorted(keys[:lo], keys[lo] - span) if nd else lo
        hr_hi = (lo + nd + np.searchsorted(keys[hi:], keys[hi - 1] + span + 1)
                 if nd else hi)
        hl_n = lo - hl_lo
        hr_n = hr_hi - hi
        if hl_n > H or hr_n > H:
            raise ValueError(f'halo overflow: need {max(hl_n, hr_n)} > {H}')
        halo_lo[d], halo_hi[d] = hl_lo, hr_hi
        # rows this shard RECEIVES: left nbr's last hl_n rows, right's first
        if d > 0:
            # left-halo keys sit right-aligned at ext[H-hl_n:H) -> send the
            # source rows right-aligned in the slab as well
            start_in_prev = hl_lo - bounds[d - 1]
            slab_r[d - 1, H - hl_n:] = np.arange(start_in_prev,
                                                 start_in_prev + hl_n)
        if d < D - 1:
            slab_l[d + 1, :hr_n] = np.arange(0, hr_n)
        # extended key space of this shard: [halo_left | local | halo_right]
        ext_keys = np.full(H + pad + H, np.int64(1) << 62, np.int64)
        ext_keys[H - hl_n:H] = keys[hl_lo:lo]
        ext_keys[H:H + nd] = keys[lo:hi]
        ext_keys[H + pad:H + pad + hr_n] = keys[hi:hr_hi]
        order = np.argsort(ext_keys, kind='stable')
        sk = ext_keys[order]
        n_ext = int(np.searchsorted(sk, np.int64(1) << 61))
        for k, off in enumerate(offs):
            q = pack(c[lo:hi] + off[None, :])
            pos = np.searchsorted(sk[:n_ext], q)
            hit = (pos < n_ext) & (sk[np.minimum(pos, n_ext - 1)] == q)
            nmaps[d, :nd, k] = np.where(hit, order[np.minimum(pos, n_ext - 1)],
                                        H + pad + H)
    return {
        'nmap': nmaps, 'slab_left': slab_l, 'slab_right': slab_r,
        'valid': valid, 'num': valid.sum(1).astype(np.int32),
        'pad': pad, 'halo': H,
    }


def halo_extend(x_local, slab_left, slab_right, halo, axis=AXIS):
    """Inside shard_map: build each device's extended feature array
    [from-left | local | from-right] with one ppermute hop per direction.

    x_local: (pad, C); slab_*: (H,) local row indices to SEND (sentinel pad
    = send zeros). Devices at the mesh edges receive zeros."""
    D = jax.lax.axis_size(axis)
    pad, C = x_local.shape
    xz = jnp.concatenate([x_local, jnp.zeros((1, C), x_local.dtype)], 0)
    to_right = jnp.take(xz, slab_right, axis=0)          # (H, C)
    to_left = jnp.take(xz, slab_left, axis=0)
    from_left = jax.lax.ppermute(
        to_right, axis, [(i, i + 1) for i in range(D - 1)])
    from_right = jax.lax.ppermute(
        to_left, axis, [(i, i - 1) for i in range(1, D)])
    return jnp.concatenate([from_left, x_local, from_right], axis=0)


def spatial_conv(x_local, plan_dev, w, axis=AXIS,
                 compute_dtype=jnp.bfloat16):
    """One halo-exchanged sparse conv step (inside shard_map): exchange
    boundary rows, gather-GEMM with the extended-space neighbor map."""
    ext = halo_extend(x_local, plan_dev['slab_left'], plan_dev['slab_right'],
                      plan_dev['halo'], axis=axis)
    return ops.gather_conv(ext, plan_dev['nmap'], w,
                           compute_dtype=compute_dtype)


def make_spatial_conv_stack(mesh, n_layers, axis=AXIS,
                            compute_dtype=jnp.float32):
    """jitted f(x_shards, nmap, slab_l, slab_r, ws) -> (D, pad, C): `n_layers`
    successive 3^3 convs (+ relu between) over one spatially-sharded scene."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
        check_vma=False)
    def stack(x, nmap, slab_l, slab_r, ws):
        x = x[0]
        plan = {'nmap': nmap[0], 'slab_left': slab_l[0],
                'slab_right': slab_r[0], 'halo': slab_l.shape[-1]}
        for i in range(n_layers):
            x = spatial_conv(x, plan, ws[i], axis=axis,
                             compute_dtype=compute_dtype)
            if i + 1 < n_layers:
                x = jax.nn.relu(x)
        return x[None]

    return jax.jit(stack)
