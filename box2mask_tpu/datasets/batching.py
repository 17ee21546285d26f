"""Batch assembly: per-scene dicts -> one padded, static-shape device batch.

Replaces the reference's collate_fn + ME.utils.batched_coordinates
(models/dataloader.py:946-995). Differences by design (DESIGN.md):
  * instead of a batch-index coordinate column, scenes are concatenated with
    row-offset-shifted neighbor maps (sparse/coords.py.batch_pyramids) — convs can
    never mix scenes,
  * every array is padded to bucketed sizes (XLA static shapes); `valid*` masks and
    `num*` counts exclude padding exactly,
  * `pooling_ids` maps every finest-level voxel to its globally-renumbered
    oversegment (the reference's to_unique, utils/util.py:123-130); padded voxels
    map to the trash segment S_pad.

Returns (device_batch, host_meta): device_batch is a flat dict of np arrays ready
for jnp; host_meta keeps per-scene Python objects (scene/labels/projection
indices) needed by post-processing and eval.
"""

from __future__ import annotations

import numpy as np

from box2mask_tpu.sparse import coords as C
from box2mask_tpu.datasets import tables


def map_semantics_to_idx(sem_ids, id2idx):
    """Dataset id -> dense class index; invalid/ignore -> -100
    (reference SEMANTIC_ID2IDX tables, scannet.py:116-118)."""
    sem_ids = np.asarray(sem_ids)
    valid = (sem_ids >= 0) & (sem_ids < len(id2idx))
    safe = np.clip(sem_ids, 0, len(id2idx) - 1)
    return np.where(valid, id2idx[safe], tables.IGNORE).astype(np.int32)


def _pad_to(arr, n, fill=0):
    pad_n = n - arr.shape[0]
    if pad_n <= 0:
        return arr[:n]
    pad_shape = (pad_n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)], axis=0)


def _device_maps_ok(rets, cfg):
    if getattr(cfg, 'host_coordinate_maps', False):
        return False
    from box2mask_tpu.sparse.device_maps import AXIS_MAX
    ok = all(r['vox_coords'].max() < AXIS_MAX and r['vox_coords'].min() >= 0
             for r in rets)
    if not ok:
        # 10-bit/axis key packing limit: ~20m @ 2cm voxels (~40m @ 4cm).
        # The host-maps layout is a ~10x slower path — make the cliff loud.
        import warnings
        worst = max(int(r['vox_coords'].max()) for r in rets)
        warnings.warn(
            f'scene exceeds the {AXIS_MAX}-voxel/axis device-map packing '
            f'(max coord {worst}); falling back to host-built neighbor maps '
            f'(slow). Consider a larger --voxel_size or --subsample_rate.',
            RuntimeWarning, stacklevel=3)
    return ok


def build_batch(rets, cfg, sem_id2idx, mode='train', pyramids=None,
                device_maps=None, level_pads=None, seg_pad=None):
    """rets: list of per-scene dicts from voxelize_scene (+ supervision).

    Two layouts (DESIGN.md):
      * host maps (device_maps=False): scenes concatenated, padding at the tail,
        full neighbor maps built on host (sparse/coords.py),
      * device maps (default): batch carries the per-scene per-level packed
        key pyramids ('keys{l}_b', host-sorted uniques) + interleaved voxel
        arrays; every conv neighbor map is built on-device inside the jitted
        step with pure lookups (sparse/device_maps.py).

    `level_pads` / `seg_pad` force the padded sizes of the device-maps layout —
    the multi-shard loader passes common maxima so per-device batches stack
    without any sentinel rewriting (collate_device_batches).
    """
    if device_maps is None:
        device_maps = pyramids is None and _device_maps_ok(rets, cfg)
    if device_maps:
        return _build_batch_small(rets, cfg, sem_id2idx, mode,
                                  level_pads=level_pads, seg_pad=seg_pad)
    if pyramids is None:
        pyramids = [C.build_scene_pyramid(r['vox_coords']) for r in rets]
    dev = C.batch_pyramids(pyramids, vox_bucket=cfg.vox_bucket)
    V0p = dev['coords0'].shape[0]

    feats = np.concatenate([r['vox_features'] for r in rets], axis=0)
    dev['vox_features'] = _pad_to(feats.astype(np.float32), V0p)

    if cfg.do_segment_pooling:
        seg_sizes = [len(r['input_location']) for r in rets]
        S_total = sum(seg_sizes)
        S_pad = max(C.round_up(S_total, cfg.seg_bucket), cfg.seg_bucket)
        seg_off = np.concatenate([[0], np.cumsum(seg_sizes)])
        pooling = np.concatenate(
            [r['seg2vox'] + seg_off[i] for i, r in enumerate(rets)])
        dev['pooling_ids'] = _pad_to(pooling.astype(np.int32), V0p, fill=S_pad)
        dev['seg_valid'] = np.arange(S_pad) < S_total
        dev['num_segments'] = np.int32(S_total)
        dev['batch_ids'] = _pad_to(
            np.concatenate([np.full(seg_sizes[i], i, np.int32)
                            for i in range(len(rets))]), S_pad, fill=-1)
        S_axis = S_pad
    else:
        # per-voxel prediction: the "segment" axis is the voxel axis
        dev['pooling_ids'] = np.minimum(np.arange(V0p), V0p).astype(np.int32)
        dev['seg_valid'] = dev['valid0']
        dev['num_segments'] = dev['num0']
        dev['batch_ids'] = dev['batch0']
        S_axis = V0p

    loc = np.concatenate([r['input_location'] for r in rets], axis=0)
    dev['input_location'] = _pad_to(loc.astype(np.float32), S_axis)

    host = {
        'scene': [r['scene'] for r in rets],
        'labels': [r.get('labels') for r in rets],
        'vox2point': [r['vox2point'] for r in rets],
        'point2vox': [r['point2vox'] for r in rets],
        'seg2vox': [r.get('seg2vox') for r in rets],
        'seg2point': [r.get('seg2point') for r in rets],
        'vox_segments': [r['vox_segments'] for r in rets],
        'input_location': [r['input_location'] for r in rets],
        'vox_world_coords': [r['vox_world_coords'] for r in rets],
        'num_voxels': [len(r['vox_coords']) for r in rets],
    }

    if mode == 'test' or 'gt_bb_offsets' not in rets[0]:
        return dev, host

    for key, fill in (('gt_bb_offsets', 0.0), ('gt_bb_bounds', 0.0)):
        arr = np.concatenate([r[key] for r in rets], axis=0).astype(np.float32)
        dev[key] = _pad_to(arr, S_axis)
    fg = np.concatenate([r['fg_instances'] for r in rets]).astype(bool)
    dev['fg_instances'] = _pad_to(fg, S_axis)
    gt_sem = np.concatenate([r['gt_semantics'] for r in rets])
    dev['gt_semantics'] = _pad_to(gt_sem.astype(np.int32), S_axis, fill=0)
    dev['gt_semantics_idx'] = _pad_to(
        map_semantics_to_idx(gt_sem, sem_id2idx), S_axis, fill=tables.IGNORE)
    if 'gt_per_vox_semantics' in rets[0]:
        pv = np.concatenate([r['gt_per_vox_semantics'] for r in rets])
        dev['gt_per_vox_semantics'] = _pad_to(pv.astype(np.int32), V0p, fill=0)
        dev['gt_per_vox_semantics_idx'] = _pad_to(
            map_semantics_to_idx(pv, sem_id2idx), V0p, fill=tables.IGNORE)
    host['instance_ids'] = [r.get('instance_ids') for r in rets]
    return dev, host


def _key_conv_backend_ok(cfg):
    """key_conv is a TPU kernel; on other backends only the (slow) interpret
    mode exists, so plans are emitted there only when explicitly forced
    (tests)."""
    if getattr(cfg, 'key_conv_force', False):
        return True
    import jax
    return jax.default_backend() == 'tpu'


def _build_batch_small(rets, cfg, sem_id2idx, mode, level_pads=None,
                       seg_pad=None):
    """Device-maps batch: per-scene per-level key pyramids + interleaved
    voxel arrays.

    Voxel-axis arrays use the `B*Vs` interleaved layout (scene i rows at
    [i*Vs, i*Vs+n_i)); the 'keys{l}_b' static shapes parameterize the
    on-device map builder.
    """
    from box2mask_tpu.sparse.device_maps import (host_level_keys, SENT_KEY,
                                                 NUM_LEVELS)
    from box2mask_tpu.sparse.coords import round_up
    B = len(rets)
    # per-scene per-level key pyramids on the host (~5ms/scene in the
    # prefetch threads) so the device map build is pure lookups — no sorts
    keys_per_scene = [host_level_keys(r['vox_coords']) for r in rets]
    if level_pads is not None:
        pads = level_pads
    else:
        pads = []
        for l in range(NUM_LEVELS):
            count = max(len(ks[l]) for ks in keys_per_scene)
            bucket = max(min(512, cfg.vox_bucket), cfg.vox_bucket >> l)
            pads.append(max(round_up(count, bucket), bucket))
        pads = tuple(pads)
    Vs = pads[0]
    ns = [len(r['vox_coords']) for r in rets]
    dev = {}
    sent = int(SENT_KEY)
    for l in range(NUM_LEVELS):
        kb = np.full((B, pads[l]), sent, np.int32)
        for i, ks in enumerate(keys_per_scene):
            kb[i, :len(ks[l])] = ks[l]
        dev[f'keys{l}_b'] = kb

    kc = getattr(cfg, 'key_conv', 'off')
    if ((kc == 'on' or (kc == 'eval' and mode != 'train'))
            and all(p % 128 == 0 for p in pads) and _key_conv_backend_ok(cfg)):
        # inference conv path: per-tile window plans + host up-maps instead of
        # on-device neighbor maps (sparse/key_conv.py; a few KB per scene)
        from box2mask_tpu.sparse import key_conv as KC
        per_scene_plans = [
            KC.host_conv_plans([dev[f'keys{l}_b'][i] for l in
                                range(NUM_LEVELS)],
                               stem_kernel=5)
            for i in range(B)]
        for k in per_scene_plans[0]:
            dev[k] = np.stack([p[k] for p in per_scene_plans])
        # NO up_parent{l} on the kc wire (round-4 verdict #5, ~0.25 MB/scene
        # = 15% of the wire): the up transpose rides the stride_parent
        # kernel over the kcu plans, the down-conv backward rides the same
        # plans (key_conv_down_plan_train), and up_widx derives in-jit from
        # the key bits (engine/state.ensure_maps). The nmap path derives its
        # own on device; spatial sharding ships sp_kcd_par separately.

    def interleave(key, ncols=None, fill=0, dtype=None):
        a0 = np.asarray(rets[0][key])
        shape = (B, Vs) + a0.shape[1:]
        out = np.full(shape, fill, dtype or a0.dtype)
        for i, r in enumerate(rets):
            out[i, :ns[i]] = r[key]
        return out.reshape((B * Vs,) + a0.shape[1:])

    dev['vox_features'] = interleave('vox_features', dtype=np.float32)
    valid0 = np.zeros((B, Vs), bool)
    batch0 = np.full((B, Vs), -1, np.int32)
    for i, n in enumerate(ns):
        valid0[i, :n] = True
        batch0[i, :n] = i
    dev['valid0'] = valid0.reshape(-1)
    dev['batch0'] = batch0.reshape(-1)
    dev['num0'] = np.int32(sum(ns))

    if cfg.do_segment_pooling:
        seg_sizes = [len(r['input_location']) for r in rets]
        S_total = sum(seg_sizes)
        S_pad = seg_pad if seg_pad is not None else max(
            C.round_up(S_total, cfg.seg_bucket), cfg.seg_bucket)
        seg_off = np.concatenate([[0], np.cumsum(seg_sizes)])
        pooling = np.full((B, Vs), S_pad, np.int32)
        for i, r in enumerate(rets):
            pooling[i, :ns[i]] = r['seg2vox'] + seg_off[i]
        dev['pooling_ids'] = pooling.reshape(-1)
        dev['seg_valid'] = np.arange(S_pad) < S_total
        dev['num_segments'] = np.int32(S_total)
        dev['batch_ids'] = _pad_to(
            np.concatenate([np.full(seg_sizes[i], i, np.int32)
                            for i in range(B)]), S_pad, fill=-1)
        S_axis = S_pad
        loc = np.concatenate([r['input_location'] for r in rets], axis=0)
        dev['input_location'] = _pad_to(loc.astype(np.float32), S_axis)
        seg_layout = lambda key, fill: _pad_to(  # noqa: E731
            np.concatenate([np.asarray(r[key]) for r in rets], axis=0),
            S_axis, fill=fill)
    else:
        dev['pooling_ids'] = np.arange(B * Vs, dtype=np.int32)
        dev['seg_valid'] = dev['valid0']
        dev['num_segments'] = dev['num0']
        dev['batch_ids'] = dev['batch0']
        dev['input_location'] = interleave('input_location', dtype=np.float32)
        seg_layout = lambda key, fill: interleave(key, fill=fill)  # noqa: E731

    host = {
        'scene': [r['scene'] for r in rets],
        'labels': [r.get('labels') for r in rets],
        'vox2point': [r['vox2point'] for r in rets],
        'point2vox': [r['point2vox'] for r in rets],
        'seg2vox': [r.get('seg2vox') for r in rets],
        'seg2point': [r.get('seg2point') for r in rets],
        'vox_segments': [r['vox_segments'] for r in rets],
        'input_location': [r['input_location'] for r in rets],
        'vox_world_coords': [r['vox_world_coords'] for r in rets],
        'num_voxels': ns,
        'interleaved_vs': Vs,
    }
    if mode == 'test' or 'gt_bb_offsets' not in rets[0]:
        return dev, host

    dev['gt_bb_offsets'] = seg_layout('gt_bb_offsets', 0.0).astype(np.float32)
    dev['gt_bb_bounds'] = seg_layout('gt_bb_bounds', 0.0).astype(np.float32)
    dev['fg_instances'] = seg_layout('fg_instances', False).astype(bool)
    gt_sem = seg_layout('gt_semantics', 0).astype(np.int32)
    dev['gt_semantics'] = gt_sem
    dev['gt_semantics_idx'] = np.where(
        dev['seg_valid'] if cfg.do_segment_pooling else dev['valid0'],
        map_semantics_to_idx(gt_sem, sem_id2idx), tables.IGNORE).astype(np.int32)
    if 'gt_per_vox_semantics' in rets[0]:
        pv = interleave('gt_per_vox_semantics', dtype=np.int64)
        dev['gt_per_vox_semantics'] = pv.astype(np.int32)
        dev['gt_per_vox_semantics_idx'] = np.where(
            dev['valid0'], map_semantics_to_idx(pv, sem_id2idx),
            tables.IGNORE).astype(np.int32)
    host['instance_ids'] = [r.get('instance_ids') for r in rets]
    return dev, host


# key -> (row_axis, input_axis) where axes are 'L<level>' or 'S' (segment axis).
def _batch_key_layout(num_levels=8):
    layout = {}
    for l in range(num_levels):
        layout[f'coords{l}'] = (f'L{l}', None, 0)
        layout[f'valid{l}'] = (f'L{l}', None, False)
        layout[f'batch{l}'] = (f'L{l}', None, -1)
        layout[f'nmap3_{l}'] = (f'L{l}', f'L{l}', None)
    layout['nmap5_0'] = ('L0', 'L0', None)
    for l in range(num_levels - 1):
        layout[f'down{l}'] = (f'L{l + 1}', f'L{l}', None)
        layout[f'up_parent{l}'] = (f'L{l}', f'L{l + 1}', None)
        layout[f'up_widx{l}'] = (f'L{l}', None, 0)
    layout['vox_features'] = ('L0', None, 0)
    layout['pooling_ids'] = ('L0', 'S', None)
    layout['gt_per_vox_semantics'] = ('L0', None, 0)
    layout['gt_per_vox_semantics_idx'] = ('L0', None, tables.IGNORE)
    for k, fill in (('input_location', 0), ('gt_bb_offsets', 0),
                    ('gt_bb_bounds', 0), ('fg_instances', False),
                    ('seg_valid', False), ('batch_ids', -1),
                    ('gt_semantics', 0), ('gt_semantics_idx', tables.IGNORE)):
        layout[k] = ('S', None, fill)
    return layout


def repad_batch(dev, target_sizes, num_levels=8):
    """Re-pad a device batch to larger per-axis sizes ('L<l>' and 'S'), rewriting
    sentinel indices (== old input-axis pad size) to the new pad size. Needed to
    stack per-device batches of a data-parallel step to one common shape."""
    cur = {f'L{l}': dev[f'coords{l}'].shape[0] for l in range(num_levels)}
    cur['S'] = dev['seg_valid'].shape[0] if 'seg_valid' in dev else None
    layout = _batch_key_layout(num_levels)
    out = {}
    for k, v in dev.items():
        if k not in layout:
            out[k] = v      # scalars (num{l}, num_segments)
            continue
        row_axis, in_axis, fill = layout[k]
        n_new = target_sizes[row_axis]
        v = np.asarray(v)
        if in_axis is not None:
            old_sent, new_sent = cur[in_axis], target_sizes[in_axis]
            v = np.where(v == old_sent, new_sent, v)
            fill = new_sent
        out[k] = _pad_to(v, n_new, fill=fill)
    return out


def collate_device_batches(batches, num_levels=8):
    """Stack D per-device batches into leading-axis-D arrays.

    Device-maps batches (carrying 'keys0_b') must already share shapes —
    the loader builds them with forced common level/segment pads — so they
    stack directly. Host-maps batches are first repadded to the per-axis
    maxima (sentinel rewrite in repad_batch)."""
    if 'keys0_b' in batches[0]:
        for k in batches[0]:
            shapes = {np.asarray(b[k]).shape for b in batches}
            if len(shapes) != 1:
                raise ValueError(
                    f'device-maps shards disagree on {k!r} shape {shapes}; '
                    'build them with common level_pads/seg_pad')
        return {k: np.stack([np.asarray(b[k]) for b in batches])
                for k in batches[0]}
    axes = [f'L{l}' for l in range(num_levels)] + ['S']
    target = {a: max(b['coords' + a[1:]].shape[0] if a.startswith('L')
                     else b['seg_valid'].shape[0] for b in batches) for a in axes}
    padded = [repad_batch(b, target, num_levels) for b in batches]
    return {k: np.stack([p[k] for p in padded]) for k in padded[0]}
