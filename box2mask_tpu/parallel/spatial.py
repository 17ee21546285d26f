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


# ---------------------------------------------------------------------------
# Full-U-Net spatial sharding (round 3): one scene's SelectionNet forward
# split across the mesh. Levels 0..G-1 (G = gather_level) hold almost all
# voxels and are sharded as contiguous key-sorted slabs with halo-exchanged
# convs; levels G..7 are tiny (<= V/8^G rows) and run replicated on every
# device after one all_gather. This is the TPU answer to the reference's
# downsampling of huge scenes (config_loader.py:33-35,
# dataprocessing/arkitscenes.py:351-354): full resolution, D-way memory.
# ---------------------------------------------------------------------------

def build_spatial_unet_batch(ret, n_shards, gather_level=3, stem_kernel=5,
                             bucket=128, halo_bucket=128, seg_bucket=64,
                             num_levels=8, sem_id2idx=None, key_conv=False):
    """Host: build the sharded batch for ONE scene's full SelectionNet forward.

    Returns (dev, meta):
      dev: dict of arrays; 'sp_*' arrays carry a leading shard axis (D, ...)
           and shard over the mesh 'space' axis; everything else is
           replicated. Includes the standard replicated pyramid ('g_' prefix)
           for levels >= gather_level plus segment-level arrays under their
           usual names (input_location, seg_valid, ...).
      meta: static ints the forward needs: halos per level, pads, G, D.

    Halo sizes are MEASURED from the actual global neighbor maps (the rows
    each shard's consumers reference beyond its slab), rounded to
    halo_bucket — not defaulted to the shard width (round-2 review weak #7).
    """
    from box2mask_tpu.sparse.coords import (build_scene_pyramid,
                                            batch_pyramids, pack, round_up)
    G, D = gather_level, n_shards
    coords = np.asarray(ret['vox_coords'])
    keys0 = pack(coords)
    perm = np.argsort(keys0, kind='stable')
    assert len(np.unique(keys0)) == len(keys0), 'voxel coords must be unique'
    coords = coords[perm]
    feats = np.asarray(ret['vox_features'])[perm]
    vox_seg = np.asarray(ret['seg2vox'])[perm]        # per-voxel segment id

    pyr = build_scene_pyramid(coords, num_levels=num_levels,
                              stem_kernel=stem_kernel)
    level_keys = [pack(pyr[f'coords{l}'].astype(np.int64))
                  for l in range(num_levels)]
    n_l = [len(k) for k in level_keys]

    # shard bounds: balanced at level 0; coarser levels follow by flooring the
    # level-0 boundary keys so every level's slab d covers the same space
    bounds = np.zeros((G + 1, D + 1), np.int64)
    per = -(-n_l[0] // D)
    bounds[0] = [min(i * per, n_l[0]) for i in range(D + 1)]
    for l in range(1, G + 1):
        m = ~np.int64((1 << l) - 1)
        bkeys = []
        for d in range(D + 1):
            b0 = bounds[0][d]
            if b0 >= n_l[0]:
                bkeys.append(np.int64(1) << 62)
            else:
                c0 = pyr['coords0'][b0].astype(np.int64)
                bkeys.append(pack((c0 & m)[None, :])[0])
        bounds[l] = np.searchsorted(level_keys[l], np.asarray(bkeys))
        bounds[l][-1] = n_l[l]

    pads = [max(round_up(int(np.diff(bounds[l]).max()), bucket), bucket)
            for l in range(G)]
    padG_shard = max(round_up(int(np.diff(bounds[G]).max()), bucket), bucket)

    # ---- measure halo needs per sharded level from the global maps --------
    # consumers of level-l rows: nmap3_l (out rows level l), nmap5_0 (l==0),
    # down{l} (out rows level l+1), up_parent{l-1} (out rows level l-1,
    # values reference level l)
    need = np.zeros((G, D, 2), np.int64)

    def _account_map(mp, in_level, out_bounds):
        mp = np.asarray(mp, np.int64)     # int64 BEFORE the max-sentinel
        if mp.ndim == 1:                  # where() below (int32 would wrap)
            mp = mp[:, None]
        masked_min = np.where(mp < 0, np.iinfo(np.int64).max, mp).min(axis=1)
        masked_max = np.where(mp < 0, -1, mp).max(axis=1)
        for d in range(D):
            lo_o, hi_o = out_bounds[d], out_bounds[d + 1]
            mi = masked_min[lo_o:hi_o]
            ma = masked_max[lo_o:hi_o]
            mi = mi[mi != np.iinfo(np.int64).max]
            ma = ma[ma >= 0]
            if not len(mi):
                continue
            lo_i, hi_i = bounds[in_level][d], bounds[in_level][d + 1]
            need[in_level, d, 0] = max(need[in_level, d, 0],
                                       lo_i - int(mi.min()))
            need[in_level, d, 1] = max(need[in_level, d, 1],
                                       int(ma.max()) + 1 - hi_i)

    for l in range(G):
        _account_map(pyr[f'nmap3_{l}'], l, bounds[l])
        if l == 0:
            _account_map(pyr['nmap5_0'], 0, bounds[0])
        _account_map(pyr[f'down{l}'], l, bounds[l + 1])   # out rows level l+1
        if l + 1 < G:
            _account_map(pyr[f'up_parent{l}'], l + 1, bounds[l])
    halos = [max(halo_bucket, round_up(int(need[l].max()), halo_bucket))
             for l in range(G)]
    for l in range(G):
        smallest = int(np.diff(bounds[l]).min())
        if halos[l] > smallest:
            raise ValueError(
                f'level {l}: halo {halos[l]} exceeds smallest shard '
                f'{smallest}; use fewer shards for this scene')

    dev = {}

    def _to_ext(mp, in_level, out_bounds, d):
        """Global row refs -> ext-space indices for shard d (sentinel = ext)."""
        H = halos[in_level]
        pad = pads[in_level] if in_level < G else padG_shard
        lo = bounds[in_level][d]
        hi = bounds[in_level][d + 1]
        sent = H + pad + H
        mp = np.asarray(mp, np.int64)
        out = np.where(mp < 0, sent, mp - lo + H)
        # right halo rows sit after the PADDED local block
        out = np.where((mp >= hi), mp - hi + H + pad, out)
        assert ((out >= 0) & (out <= sent)).all()
        return out.astype(np.int32)

    def _shard_rows(arr, l, out_bounds, fill, ncols=None):
        """Stack per-shard row slices of a global per-row array, padded."""
        pad = pads[l] if l < G else padG_shard
        shp = (D, pad) + tuple(np.asarray(arr).shape[1:])
        out = np.full(shp, fill, np.asarray(arr).dtype)
        for d in range(D):
            lo, hi = out_bounds[d], out_bounds[d + 1]
            out[d, :hi - lo] = arr[lo:hi]
        return out

    # features / validity / pooling at level 0
    dev['sp_feats'] = _shard_rows(feats.astype(np.float32), 0, bounds[0], 0.0)
    seg_ids = np.asarray(vox_seg, np.int64)
    S = int(seg_ids.max()) + 1 if len(seg_ids) else 0
    S_pad = max(round_up(max(S, 1), seg_bucket), seg_bucket)
    dev['sp_pool'] = _shard_rows(seg_ids.astype(np.int32), 0, bounds[0],
                                 S_pad)
    for l in range(G):
        nd = np.diff(bounds[l])
        valid = np.zeros((D, pads[l]), bool)
        for d in range(D):
            valid[d, :nd[d]] = True
        dev[f'sp_valid{l}'] = valid
        dev[f'sp_num{l}'] = nd.astype(np.int32)

    # maps into ext spaces, per shard
    for l in range(G):
        H = halos[l]
        dev[f'sp_nmap3_{l}'] = np.stack([
            _to_ext(_shard_rows(pyr[f'nmap3_{l}'], l, bounds[l],
                                -1)[d], l, bounds[l], d)
            for d in range(D)])
        # slabs: rows each shard sends (local indices; sentinel pad = zeros).
        # shard d's left halo = global rows [lo-H, lo) = last H rows of the
        # LEFT neighbor  -> neighbor's slab_right; right halo analogous.
        slabL = np.full((D, H), pads[l], np.int32)
        slabR = np.full((D, H), pads[l], np.int32)
        for d in range(D):
            lo, hi = bounds[l][d], bounds[l][d + 1]
            nd = hi - lo
            if d + 1 < D:                 # send my LAST H rows to the right
                k = min(H, nd)
                slabR[d, H - k:] = np.arange(nd - k, nd)
            if d > 0:                     # send my FIRST H rows to the left
                k = min(H, nd)
                slabL[d, :k] = np.arange(0, k)
        dev[f'sp_slabL{l}'] = slabL
        dev[f'sp_slabR{l}'] = slabR
    dev['sp_nmap5'] = np.stack([
        _to_ext(_shard_rows(pyr['nmap5_0'], 0, bounds[0], -1)[d],
                0, bounds[0], d) for d in range(D)])
    for l in range(G - 1):
        dev[f'sp_down{l}'] = np.stack([
            _to_ext(_shard_rows(pyr[f'down{l}'], l + 1, bounds[l + 1],
                                -1)[d], l, bounds[l + 1], d)
            for d in range(D)])
        dev[f'sp_up_parent{l}'] = np.stack([
            _to_ext(_shard_rows(pyr[f'up_parent{l}'], l, bounds[l],
                                -1)[d], l + 1, bounds[l], d)
            for d in range(D)])
        dev[f'sp_up_widx{l}'] = _shard_rows(pyr[f'up_widx{l}'], l,
                                            bounds[l], 0)
    # transition maps at the gather level
    dev['sp_downG'] = np.stack([
        _to_ext(_shard_rows(pyr[f'down{G - 1}'], G, bounds[G], -1)[d],
                G - 1, bounds[G], d) for d in range(D)])

    # replicated pyramid for levels >= G (standard padded single-scene batch)
    g = batch_pyramids([pyr], vox_bucket=bucket)
    padG_full = g[f'valid{G}'].shape[0]
    for k, v in g.items():
        dev[f'g_{k}'] = v
    # up transpose G -> G-1: parent rows index the REPLICATED level-G array
    up_pG = _shard_rows(pyr[f'up_parent{G - 1}'], G - 1, bounds[G - 1], -1)
    dev['sp_up_parentG'] = np.where(up_pG < 0, padG_full,
                                    up_pG).astype(np.int32)
    dev['sp_up_widxG'] = _shard_rows(pyr[f'up_widx{G - 1}'], G - 1,
                                     bounds[G - 1], 0)
    # gather: global padded level-G row -> flattened (D*padG_shard) local row
    gather_rows = np.full(padG_full, D * padG_shard, np.int32)
    for d in range(D):
        lo, hi = bounds[G][d], bounds[G][d + 1]
        gather_rows[lo:hi] = d * padG_shard + np.arange(hi - lo)
    dev['sp_gather_rows'] = gather_rows

    if key_conv:
        _emit_spatial_kc_plans(dev, pyr, bounds, halos, pads, padG_shard,
                               G, D, stem_kernel)

    # segment-level arrays (replicated) under the standard batch names
    loc = np.zeros((S_pad, 3), np.float32)
    il = np.asarray(ret['input_location'], np.float32)
    loc[:len(il)] = il
    dev['input_location'] = loc
    dev['seg_valid'] = np.arange(S_pad) < S
    dev['num_segments'] = np.int32(S)
    dev['batch_ids'] = np.where(np.arange(S_pad) < S, 0, -1).astype(np.int32)

    # supervision targets (replicated; same names as datasets/batching.py so
    # nn/losses.compute_losses works unchanged on the spatial batch)
    if 'gt_bb_offsets' in ret:
        from box2mask_tpu.datasets import tables
        from box2mask_tpu.datasets.batching import map_semantics_to_idx

        def _seg_pad(key, fill, dtype):
            a = np.asarray(ret[key])
            out = np.full((S_pad,) + a.shape[1:], fill, dtype)
            out[:len(a)] = a
            return out

        dev['gt_bb_offsets'] = _seg_pad('gt_bb_offsets', 0.0, np.float32)
        dev['gt_bb_bounds'] = _seg_pad('gt_bb_bounds', 0.0, np.float32)
        dev['fg_instances'] = _seg_pad('fg_instances', False, bool)
        gt_sem = _seg_pad('gt_semantics', 0, np.int32)
        dev['gt_semantics'] = gt_sem
        if sem_id2idx is not None:
            dev['gt_semantics_idx'] = np.where(
                dev['seg_valid'], map_semantics_to_idx(gt_sem, sem_id2idx),
                tables.IGNORE).astype(np.int32)

    meta = {'halos': halos, 'pads': pads, 'gather_level': G, 'n_shards': D,
            'padG_shard': padG_shard, 'padG_full': padG_full, 'S_pad': S_pad,
            'perm': perm, 'bounds0': bounds[0].copy(),
            'boundsG': bounds[G].copy()}
    return dev, meta


def _emit_spatial_kc_plans(dev, pyr, bounds, halos, pads, padG_shard, G, D,
                           stem_kernel):
    """Per-shard key_conv window plans for the sharded levels (< G).

    The in-window key-matching kernel (sparse/key_conv.py) is shard-friendly
    by construction: each shard's extended row space [halo|local|halo] is a
    CONTIGUOUS range of the globally key-sorted rows, so it is itself sorted
    and the kernel's per-(tile, dx-group) windows apply unchanged. Layout per
    shard and level l < G:

      * sp_ext_keys{l}: (D, ext_pad) compact SORTED int32 keys — left-halo
        rows, local rows, right-halo rows back to back, SENT-padded,
      * sp_ext_map{l}:  (D, ext_pad) gather map from halo_extend's
        [H | pad | H] slot layout into the compact order,
      * sp_ext_lo{l}:   (D, 1) start of the local rows in the compact order,
      * sp_kc3_base/cnt{l} (+ spkc5 at l=0): window plans whose OUTPUT space
        is the ext space itself — outputs at halo rows are garbage near the
        ext edge but discarded by the local-rows slice, and computing them
        keeps input space == output space, which is exactly what lets
        key_conv_train reuse its forward plans for the mirrored backward,
      * sp_kcd_base/cnt{l}: down-conv plans (out = local level-(l+1) rows),
      * sp_kcd_par/widx{l}: each ext fine row's parent among THIS shard's
        local coarse rows (sentinel = coarse pad) — the transpose structure
        key_conv_down_train's backward needs.

    Requires coords within the 10-bit/axis key packing (same condition as
    the single-device key_conv path, datasets/batching.py); callers skip
    plan emission outside it and the module falls back to the nmap path.
    """
    import math
    from box2mask_tpu.sparse import key_conv as KC
    from box2mask_tpu.sparse.device_maps import AXIS_BITS, AXIS_MAX, SENT_KEY

    for l in range(G + 1):
        c = np.asarray(pyr[f'coords{l}'])
        if len(c) and (c.max() >= AXIS_MAX or c.min() < 0):
            import warnings
            warnings.warn(
                f'scene exceeds the {AXIS_MAX}-voxel/axis key packing; '
                'sharded key_conv plans skipped (nmap halo path used)',
                RuntimeWarning)
            return

    def keys10(l):
        c = pyr[f'coords{l}'].astype(np.int64)
        return ((c[:, 0] << (2 * AXIS_BITS)) | (c[:, 1] << AXIS_BITS)
                | c[:, 2]).astype(np.int32)

    k10 = [keys10(l) for l in range(G + 1)]
    offs3 = KC.offsets_3d(3)
    g3 = KC.group_by_dx(offs3)
    offs5 = KC.offsets_3d(stem_kernel)
    g5 = KC.group_by_dx(offs5)
    offsd = KC.offsets_3d(2, stride_child=True)
    gd = KC.group_by_dx(offsd)

    for l in range(G):
        H, pad = halos[l], pads[l]
        tile = math.gcd(math.gcd(H, pad), KC.TILE)
        ext_pad = H + pad + H
        out_pad = pads[l + 1] if l + 1 < G else padG_shard
        tile_out = math.gcd(out_pad, KC.TILE)
        nd_all = np.diff(bounds[l])
        ext_keys = np.full((D, ext_pad), int(SENT_KEY), np.int32)
        ext_map = np.zeros((D, ext_pad), np.int32)
        ext_lo = np.zeros((D, 1), np.int32)
        okeys = np.full((D, out_pad), int(SENT_KEY), np.int32)
        par = np.full((D, ext_pad), out_pad, np.int32)
        widx = np.zeros((D, ext_pad), np.int32)
        scale = 1 << l
        d3 = [KC.pack_delta(o, scale) for o in offs3]
        d5 = [KC.pack_delta(o, scale) for o in offs5] if l == 0 else None
        dd = [KC.pack_delta(o, scale) for o in offsd]
        win = min(KC.WINDOW, ext_pad)
        b3 = np.zeros((D, ext_pad // tile, len(g3)), np.int32)
        c3 = np.zeros_like(b3)
        b5 = c5 = None
        if l == 0:
            b5 = np.zeros((D, ext_pad // tile, len(g5)), np.int32)
            c5 = np.zeros_like(b5)
        bd = np.zeros((D, out_pad // tile_out, len(gd)), np.int32)
        cd = np.zeros_like(bd)
        m = np.int64((1 << (l + 1)) - 1)
        floor_mask = ~np.int64((int(m) << (2 * AXIS_BITS))
                               | (int(m) << AXIS_BITS) | int(m))
        coarse_valid = None
        for d in range(D):
            lo, hi = int(bounds[l][d]), int(bounds[l][d + 1])
            nd = hi - lo
            kL = min(H, int(nd_all[d - 1])) if d > 0 else 0
            kR = min(H, int(nd_all[d + 1])) if d + 1 < D else 0
            n_ext = kL + nd + kR
            ext_keys[d, :n_ext] = k10[l][lo - kL:hi + kR]
            ext_map[d, :n_ext] = np.concatenate([
                (H - kL) + np.arange(kL),          # halo_extend left slots
                H + np.arange(nd),                 # local slots
                H + pad + np.arange(kR)])          # right slots
            ext_lo[d, 0] = kL
            b3[d], c3[d] = KC._host_bases(ext_keys[d], ext_keys[d], d3, g3,
                                          win, ext_pad, tile=tile)
            if l == 0:
                b5[d], c5[d] = KC._host_bases(ext_keys[d], ext_keys[d], d5,
                                              g5, win, ext_pad, tile=tile)
            # down conv: out rows = this shard's local level-(l+1) keys
            loc, hic = int(bounds[l + 1][d]), int(bounds[l + 1][d + 1])
            okeys[d, :hic - loc] = k10[l + 1][loc:hic]
            bd[d], cd[d] = KC._host_bases(ext_keys[d], okeys[d], dd, gd,
                                          win, ext_pad, tile=tile_out)
            # transpose structure for the down backward: parent of each ext
            # fine row among the LOCAL coarse rows (sentinel out_pad if the
            # parent lives on a neighbor shard — zero contribution there;
            # that cotangent arrives via the halo exchange transpose instead)
            fine = k10[l][lo - kL:hi + kR].astype(np.int64)
            pk = (fine & floor_mask).astype(np.int32)
            cv = k10[l + 1][loc:hic]
            pos = np.searchsorted(cv, pk)
            hit = (pos < len(cv)) & (cv[np.minimum(pos, max(len(cv) - 1, 0))]
                                     == pk)
            par[d, :n_ext] = np.where(hit, pos, out_pad)
            xb = (fine >> (2 * AXIS_BITS + l)) & 1
            yb = (fine >> (AXIS_BITS + l)) & 1
            zb = (fine >> l) & 1
            widx[d, :n_ext] = (xb * 4 + yb * 2 + zb).astype(np.int32)
        dev[f'sp_ext_keys{l}'] = ext_keys
        dev[f'sp_ext_map{l}'] = ext_map
        dev[f'sp_ext_lo{l}'] = ext_lo
        dev[f'sp_kc3_base{l}'], dev[f'sp_kc3_cnt{l}'] = b3, c3
        if l == 0:
            dev['sp_kc5_base0'], dev['sp_kc5_cnt0'] = b5, c5
        dev[f'sp_kcd_base{l}'], dev[f'sp_kcd_cnt{l}'] = bd, cd
        dev[f'sp_kcd_okeys{l}'] = okeys
        dev[f'sp_kcd_par{l}'] = par
        dev[f'sp_kcd_widx{l}'] = widx


class SpatialSelectionNet:
    """Flax-compatible spatial forward of SelectionNet over a device mesh.

    Parameter tree is IDENTICAL to nn.unet.SelectionNet (same module names in
    the same structure), so checkpoints interchange freely; only the data
    movement differs: levels < gather_level run sharded with halo-exchanged
    convs, levels >= gather_level run replicated after one all_gather.
    Runs INSIDE shard_map (see make_spatial_apply); every 'sp_' batch array
    is this device's shard, everything else replicated.
    """

    def __new__(cls, *a, **k):
        # implemented as a flax module factory to keep flax.linen metaclass
        # behavior while living outside nn/ (avoids an import cycle)
        import flax.linen as nn_
        from box2mask_tpu.nn.modules import (BasicBlock, MaskedBatchNorm,
                                             SparseConv, SparseConvTranspose)
        from box2mask_tpu.nn import unet as U

        class _Spatial(nn_.Module):
            num_classes: int
            heads: tuple = ('mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
                            'mlp_semantics')
            layers: int = 2
            gather_level: int = 3
            do_segment_pooling: bool = True
            max_pool_segments: bool = False
            mlp_bounds_relu: bool = False
            stem_kernel: int = 5
            compute_dtype: jnp.dtype = jnp.bfloat16

            @nn_.compact
            def __call__(self, batch, train: bool = True):
                G = self.gather_level
                cd = self.compute_dtype

                def sp_op(nmap, l):
                    return {'nmap': nmap,
                            'slab_left': batch[f'sp_slabL{l}'],
                            'slab_right': batch[f'sp_slabR{l}'],
                            'halo': batch[f'sp_slabL{l}'].shape[-1]}

                def sp_kc(l, kind):
                    """Sharded key_conv operand (ops.gather_conv 'spatial_kc'
                    branch); kind: '3'/'5' same-level, 'd' down l -> l+1."""
                    base = {'3': f'sp_kc3_base{l}', '5': 'sp_kc5_base0',
                            'd': f'sp_kcd_base{l}'}[kind]
                    op = {'spatial_kc': ({'3': 3, '5': self.stem_kernel,
                                          'd': 2}[kind], kind == 'd', 1 << l),
                          'slab_left': batch[f'sp_slabL{l}'],
                          'slab_right': batch[f'sp_slabR{l}'],
                          'halo': batch[f'sp_slabL{l}'].shape[-1],
                          'ext_map': batch[f'sp_ext_map{l}'],
                          'ext_keys': batch[f'sp_ext_keys{l}'],
                          'bases': batch[base],
                          'counts': batch[base.replace('base', 'cnt')]}
                    if kind == 'd':
                        op['keys_out'] = batch[f'sp_kcd_okeys{l}']
                        op['up_parent'] = batch[f'sp_kcd_par{l}']
                        op['up_widx'] = batch[f'sp_kcd_widx{l}']
                    else:
                        op['ext_lo'] = batch[f'sp_ext_lo{l}']
                        op['pad'] = batch[f'sp_valid{l}'].shape[-1]
                    return op

                def has_kc(l):
                    return f'sp_kc3_base{l}' in batch

                def vn(l):
                    if l < G:
                        return batch[f'sp_valid{l}'], batch[f'sp_num{l}']
                    return batch[f'g_valid{l}'], batch[f'g_num{l}']

                def ax(l):
                    return AXIS if l < G else None

                def bn(name, l):
                    return MaskedBatchNorm(axis_name=ax(l), name=name)

                def blocks(x, l, planes, stage):
                    nbr = ((sp_kc(l, '3') if has_kc(l)
                            else sp_op(batch[f'sp_nmap3_{l}'], l)) if l < G
                           else batch[f'g_nmap3_{l}'])
                    v, n = vn(l)
                    for i in range(self.layers):
                        x = BasicBlock(planes, axis_name=ax(l),
                                       compute_dtype=cd,
                                       name=f'{stage}_block{i}')(
                            x, nbr, v, n, train)
                    return x

                x = SparseConv(U.INIT_DIM, self.stem_kernel ** 3,
                               compute_dtype=cd, name='stem_conv')(
                    batch['sp_feats'],
                    sp_kc(0, '5') if 'sp_kc5_base0' in batch
                    else sp_op(batch['sp_nmap5'], 0))
                v, n = vn(0)
                x = bn('stem_bn', 0)(x, v, n, train)
                x = jax.nn.relu(x)
                skips = [x]

                for l in range(1, 8):
                    if l <= G and has_kc(l - 1):
                        nbr = sp_kc(l - 1, 'd')
                    elif l < G:
                        nbr = sp_op(batch[f'sp_down{l - 1}'], l - 1)
                    elif l == G:
                        nbr = sp_op(batch['sp_downG'], G - 1)
                    else:
                        nbr = batch[f'g_down{l - 1}']
                    x = SparseConv(x.shape[-1], 8, compute_dtype=cd,
                                   name=f'down{l}_conv')(x, nbr)
                    if l == G:
                        # shards -> replicated global level-G rows. Built as
                        # psum(zeros.at[my slot].set(local)) rather than
                        # all_gather: psum's transpose is psum, so the
                        # backward correctly SUMS every device's partial
                        # cotangents for each slot — all_gather's transpose
                        # slices only the local block and silently drops the
                        # cross-shard boundary contributions that arrive via
                        # the decoder's up-transpose scatter (caught by
                        # tests/test_spatial_unet.py grad equality).
                        ps = x.shape[0]
                        d_idx = jax.lax.axis_index(AXIS)
                        buf = jnp.zeros(
                            (jax.lax.axis_size(AXIS) * ps, x.shape[-1]),
                            x.dtype)
                        buf = jax.lax.dynamic_update_slice(
                            buf, x, (d_idx * ps, 0))
                        flat = jax.lax.psum(buf, AXIS)
                        flat = jnp.concatenate(
                            [flat, jnp.zeros((1, x.shape[-1]), flat.dtype)],
                            axis=0)
                        x = jnp.take(flat, batch['sp_gather_rows'], axis=0)
                    v, n = vn(l)
                    x = bn(f'down{l}_bn', l)(x, v, n, train)
                    x = jax.nn.relu(x)
                    x = blocks(x, l, U.ENC_PLANES[l - 1], f'enc{l}')
                    skips.append(x)

                for i, l in enumerate(range(6, -1, -1)):
                    if l + 1 > G:
                        xc = x
                        parent = batch[f'g_up_parent{l}']
                        widx = batch[f'g_up_widx{l}']
                    elif l + 1 == G:
                        xc = x                    # replicated level-G rows
                        parent = batch['sp_up_parentG']
                        widx = batch['sp_up_widxG']
                    else:
                        xc = halo_extend(
                            x, batch[f'sp_slabL{l + 1}'],
                            batch[f'sp_slabR{l + 1}'],
                            batch[f'sp_slabL{l + 1}'].shape[-1])
                        parent = batch[f'sp_up_parent{l}']
                        widx = batch[f'sp_up_widx{l}']
                    x = SparseConvTranspose(U.DEC_PLANES[i], compute_dtype=cd,
                                            name=f'up{l}_tr')(xc, parent,
                                                              widx)
                    v, n = vn(l)
                    x = bn(f'up{l}_bn', l)(x, v, n, train)
                    x = jax.nn.relu(x)
                    x = jnp.concatenate([x, skips[l]], axis=-1)
                    x = blocks(x, l, U.DEC_PLANES[i], f'dec{l}')

                outputs = {}
                if any('per_vox' in h for h in self.heads):
                    outputs['vox_feats'] = x     # sharded (this device's rows)

                if self.do_segment_pooling:
                    S_pad = batch['seg_valid'].shape[0]
                    pool_ids = batch['sp_pool']
                    if self.max_pool_segments:
                        # NOTE empty-local-segment rows contribute 0 (matches
                        # single-device segment_max's empty behavior)
                        part = ops.segment_max(x, pool_ids, S_pad)
                        pooled = jax.lax.pmax(part, AXIS)
                    else:
                        s = ops.segment_sum(x, pool_ids, S_pad)
                        c = ops.segment_sum(
                            jnp.ones((x.shape[0], 1), jnp.float32),
                            pool_ids, S_pad)
                        s = jax.lax.psum(s, AXIS)
                        c = jax.lax.psum(c, AXIS)
                        pooled = s / jnp.maximum(c, 1.0)
                    pv, pn = batch['seg_valid'], batch['num_segments']
                else:
                    pooled, (pv, pn) = x, vn(0)

                head_dims = {'mlp_offsets': 3, 'mlp_bounds': 3,
                             'mlp_bb_scores': 1, 'mlp_center_scores': 1,
                             'mlp_semantics': self.num_classes,
                             'mlp_per_vox_semantics': self.num_classes}
                for head in self.heads:
                    if 'per_vox' in head:
                        v0, n0 = vn(0)
                        out = U.HeadMLP(head_dims[head], axis_name=AXIS,
                                        compute_dtype=cd, name=head)(
                            x, v0, n0, train)
                    else:
                        out = U.HeadMLP(head_dims[head], axis_name=None,
                                        compute_dtype=cd, name=head)(
                            pooled, pv, pn, train)
                    if self.mlp_bounds_relu and head == 'mlp_bounds':
                        out = jax.nn.relu(out)
                    outputs[head] = out
                return outputs

        return _Spatial(*a, **k)


def spatial_in_specs(dev):
    """PartitionSpec per batch key: 'sp_' arrays shard over the space axis
    (except the replicated gather map), everything else is replicated."""
    return {k: (P(AXIS) if k.startswith('sp_') and k != 'sp_gather_rows'
                else P())
            for k in dev}


def make_spatial_apply(mesh, model, dev, train=False, mutable=False):
    """jitted fn(variables, dev_batch) -> head outputs (replicated).

    dev_batch: arrays from build_spatial_unet_batch ('sp_' arrays lead with
    the shard axis). The forward runs under shard_map over mesh axis 'space';
    sharded block views are squeezed to this device's rows before apply."""
    specs = spatial_in_specs(dev)
    sharded = {k for k, s in specs.items() if s == P(AXIS)}

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(), specs), out_specs=P(),
        check_vma=False)
    def fwd(variables, batch):
        local = {k: (v[0] if k in sharded else v) for k, v in batch.items()}
        if mutable:
            return model.apply(variables, local, train=train,
                               mutable=['batch_stats'])
        return model.apply(variables, local, train=train)

    return jax.jit(fwd)


def make_spatial_train_step(mesh, cfg, model, tx, dev):
    """jitted (state, batch, lr, bb_w, cs_w) -> (state, loss_dict) for ONE
    spatially-sharded scene.

    Gradient math under shard_map (verified by tests/test_spatial_unet.py's
    grad-equality check): the loss is computed identically on every device
    from the psum'd segment pool. With check_vma off, shard_map transposes
    `psum` to `psum`, so the pool's VJP hands every device D x the true
    pooled cotangent; below the pool each device then holds D x its true
    partial contribution (psum'd grads = D x true), and the head MLPs above
    the pool compute the full gradient on every device (psum'd = D x true as
    well). One uniform 1/D after `psum(grads)` therefore recovers the exact
    single-device gradients for EVERY parameter."""
    import optax
    from box2mask_tpu.nn import losses as L
    from box2mask_tpu.engine.state import TrainState
    specs = spatial_in_specs(dev)
    sharded = {k for k, s in specs.items() if s == P(AXIS)}
    D = mesh.shape[AXIS]
    assert not any('per_vox' in h for h in model.heads), \
        'per-vox heads are not supported under --spatial_shards yet'

    def local_step(state, batch, lr, bb_w, cs_w):
        local = {k: (v[0] if k in sharded else v) for k, v in batch.items()}

        def loss_fn(params, batch_stats):
            out, mut = model.apply(
                {'params': params, 'batch_stats': batch_stats}, local,
                train=True, mutable=['batch_stats'])
            ld = L.compute_losses(cfg, out, local, bb_w, cs_w)
            return ld['optimization_loss'], (ld, mut['batch_stats'])

        (_, (ld, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        grads = jax.tree.map(lambda g: g / D,
                             jax.lax.psum(grads, AXIS))
        opt_state = state.opt_state
        opt_state.hyperparams['learning_rate'] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1), ld

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), specs, P(), P(), P()), out_specs=P(),
        check_vma=False)
    return jax.jit(step)


def make_spatial_init(mesh, model, dev, seed=0):
    """Initialize variables by running the spatial module once inside
    shard_map (its collectives need the mesh). Params are identical on every
    device; the tree matches nn.unet.SelectionNet exactly."""
    specs = spatial_in_specs(dev)
    sharded = {k for k, s in specs.items() if s == P(AXIS)}

    full = {k: jnp.asarray(v) for k, v in dev.items()}

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(), specs),
                       out_specs=P(), check_vma=False)
    def init_sharded(key, batch):
        local = {k: (v[0] if k in sharded else v) for k, v in batch.items()}
        return model.init(key, local, train=False)

    return jax.jit(init_sharded)(jax.random.PRNGKey(seed), full)


def make_spatial_val_step(mesh, cfg, model, dev):
    """jitted (state, batch, bb_w, cs_w) -> loss dict (eval-mode forward)."""
    from box2mask_tpu.nn import losses as L
    specs = spatial_in_specs(dev)
    sharded = {k for k, s in specs.items() if s == P(AXIS)}

    def local_step(state, batch, bb_w, cs_w):
        local = {k: (v[0] if k in sharded else v) for k, v in batch.items()}
        out = model.apply({'params': state.params,
                           'batch_stats': state.batch_stats}, local,
                          train=False)
        return L.compute_losses(cfg, out, local, bb_w, cs_w)

    step = shard_map(local_step, mesh=mesh,
                     in_specs=(P(), specs, P(), P()), out_specs=P(),
                     check_vma=False)
    return jax.jit(step)
