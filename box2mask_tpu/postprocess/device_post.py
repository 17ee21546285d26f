"""Fully on-device detection->masks post-processing (jitted).

The host oracle (postprocess/detection2mask.py) mirrors the reference's NumPy/
torch pipeline (models/detection_net.py:369-488) and costs ~0.8s per
ScanNet-scale scene — the largest line of the inference wall. This module runs
the identical semantics on the chip:

  1. votes -> [sigmoid(score), min, max] boxes (min_bb clamp),
  2. foreground filter from the semantics head + NMS clustering
     (lax.while_loop, one vectorized IoU row per step),
  3. score threshold, heatmap projection seg->vox via `pooling_ids` (a row
     gather), binarization,
  4. greedy mask NMS on a precomputed IoU matrix from ONE MXU matmul
     (exact counts: 0/1 bf16 products, f32 accumulation),
  5. per-mask majority-vote semantics via a mask x one-hot matmul,
  6. kept rows compacted to the front (stable argsort) and masks bit-packed
     to uint8 so the device->host readback is V/8 bytes per mask.

Only scalar metadata + packed masks leave the chip. The device sits behind a
high-RTT tunnel (measured ~29ms per dispatch round-trip, ~40MB/s transfer),
so the fused path (`make_fused_infer`) returns ONE stacked dict per batch:
each scene's masks are packed over its own interleaved voxel window and only
the `top_k` best rows are kept, so the whole batch reads back in a single
`jax.device_get` with zero extra dispatches. Overflow past `top_k` (rare;
degenerate early-training predictions) falls back to the unfused per-scene
path. `stacked_masks_to_results` / `device_masks_to_results` unpack on the
host and project vox->point, returning the same result dict as
detection_to_masks(mode='eval').
"""

from __future__ import annotations

import warnings

import os

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.postprocess import nms


def _pack_bits(masks):
    """(R, V) bool -> (R, V//8) uint8, little-endian bit order."""
    R, V = masks.shape
    assert V % 8 == 0, (
        f'mask width {V} not a multiple of 8 — pick a vox_bucket/seg_bucket '
        'divisible by 8 (device mask bit-packing reads back width/8 bytes '
        'per row)')
    w = jnp.left_shift(jnp.uint8(1),
                       jnp.arange(8, dtype=jnp.uint8)[None, None, :])
    return jnp.sum(masks.reshape(R, V // 8, 8).astype(jnp.uint8) * w,
                   axis=-1).astype(jnp.uint8)


def _make_core(cfg, valid_class_ids, is_foreground, max_masks):
    """Shared traced pipeline: votes -> ordered masks for one scene.

    Returns a traceable fn(pred, batch, scene_idx, ths) -> dict with
    n_keep, conf (R,), label_idx (R,), masks (R, V) bool ordered kept-first,
    cluster_cap_hit (bool) — True when the static cluster bound truncated
    NMS clustering (the reference loop is unbounded, iou_nms.py:84-100)."""
    ids = np.asarray(valid_class_ids)
    fg_lut = jnp.asarray(np.asarray(is_foreground(ids)).astype(bool))
    min_bb = cfg.min_bb_size
    off_h, bnd_h = cfg.mlp_offsets, cfg.mlp_bounds
    score_h, sem_h = cfg.mlp_bb_scores, cfg.mlp_semantics

    def core(pred, batch, scene_idx, ths, vox_slice=None):
        """vox_slice: optional static slice restricting the voxel axis to one
        scene's interleaved window — shrinks every voxel-width op (mask
        projection, NMS matmul, packing) from V to V/B so per-scene postproc
        cost is independent of batch size."""
        cluster_th, score_th, mask_bin_th, mask_nms_th = ths
        # a mask_nms_th >= 1.0 would never suppress the selected row itself
        # (its self-IoU is forced to 1.0), livelocking the greedy loop; the
        # loop below is also iteration-bounded as a second line of defense
        mask_nms_th = jnp.minimum(mask_nms_th, 1.0 - 1e-6)
        loc = batch['input_location']
        S = loc.shape[0]
        off = pred[off_h][:S]
        bnd = pred[bnd_h][:S]
        if min_bb is not None:       # to_min_size clamp (detection_net.py:519)
            bnd = jnp.maximum(bnd, min_bb)
        scores = jax.nn.sigmoid(pred[score_h][:S, 0])
        center = loc + off
        boxes = jnp.concatenate(
            [scores[:, None], center - bnd, center + bnd], axis=1)
        sem_idx = jnp.argmax(pred[sem_h][:S], axis=1)
        fg = (fg_lut[sem_idx] & batch['seg_valid']
              & (batch['batch_ids'] == scene_idx))

        reps, heatmaps, repv, cap_hit = nms.nms_clustering_jax(
            boxes, fg, cluster_th=cluster_th, max_clusters=max_masks,
            return_overflow=True)
        rep_scores = boxes[reps, 0]
        keep0 = repv & (rep_scores > score_th)
        # zero heatmap over background segments (detection2mask hm_w_bg)
        heatmaps = heatmaps * fg[None, :].astype(heatmaps.dtype)

        pool = batch['pooling_ids']                      # (V,) voxel -> segment
        valid0, batch0 = batch['valid0'], batch['batch0']
        if vox_slice is not None:
            pool, valid0, batch0 = (pool[vox_slice], valid0[vox_slice],
                                    batch0[vox_slice])
        vox_ok = valid0 & (batch0 == scene_idx) & (pool < S)
        pool_c = jnp.minimum(pool, S - 1)
        # project seg->vox as a ROW gather of the transposed heatmap table
        vox_heat_t = heatmaps.T[pool_c]                  # (V, R)
        masks_t = (vox_heat_t > mask_bin_th) & vox_ok[:, None]   # (V, R)

        # greedy mask NMS on the full IoU matrix from one MXU matmul
        M = masks_t.astype(jnp.bfloat16)
        inter = jax.lax.dot_general(
            M, M, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, R)
        areas = jnp.diagonal(inter)
        union = areas[:, None] + areas[None, :] - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 0.0)
        R = iou.shape[0]
        idx = jnp.arange(R)

        def body(state):
            it, remaining, keep = state
            top = jnp.argmax(jnp.where(remaining, R - idx, 0))
            keep = keep.at[top].set(True)
            row = iou[top].at[top].set(1.0)
            remaining = remaining & (row <= mask_nms_th)
            return it + 1, remaining, keep

        def cond(state):
            it, remaining, _ = state
            return jnp.any(remaining) & (it < R)

        _, _, keep = jax.lax.while_loop(
            cond, body, (jnp.int32(0), keep0, jnp.zeros(R, bool)))

        # per-mask majority-vote semantics: counts = mask @ one_hot(vox_sem)
        vox_sem = sem_idx[pool_c]
        onehot = jax.nn.one_hot(vox_sem, fg_lut.shape[0], dtype=jnp.bfloat16)
        counts = jax.lax.dot_general(
            M, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, C)
        label_idx = jnp.argmax(counts, axis=1).astype(jnp.int32)

        # compact kept rows to the front (stable: preserves score-desc order)
        order = jnp.argsort(~keep, stable=True)
        # a mask IS a set of segments (the heatmap is per-segment; the voxel
        # mask is its gather through pooling_ids), so the segment-level
        # bitmap reconstructs the voxel/point mask exactly on the host via
        # seg2vox — at S_pad/8 bytes per row instead of V/8 (64x smaller
        # readback at ScanNet scale; decisive when the tunnel is
        # bandwidth-starved, measured as low as ~12 MB/s D2H)
        seg_masks = (heatmaps > mask_bin_th)             # (R, S)
        return {'n_keep': jnp.sum(keep).astype(jnp.int32),
                'conf': rep_scores[order],
                'label_idx': label_idx[order],
                'masks': masks_t.T[order],               # (R, V) bool
                'seg_masks': seg_masks[order],           # (R, S) bool
                'cluster_cap_hit': cap_hit}

    return core


def make_device_postproc(cfg, valid_class_ids, is_foreground, max_masks=256):
    """Returns jitted fn(pred, batch, scene_idx, ths) -> compact result dict.

    `scene_idx` and the 4 thresholds are traced (no recompile per scene or per
    param-search point); `max_masks` is the static cluster bound (reference has
    no bound; trained models produce far fewer clusters than 256 — overflow is
    reported via `cluster_cap_hit`)."""
    core = _make_core(cfg, valid_class_ids, is_foreground, max_masks)

    @jax.jit
    def post(pred, batch, scene_idx, ths):
        out = core(pred, batch, scene_idx, ths)
        masks = out.pop('masks')
        out['masks_packed'] = _pack_bits(masks)
        return out

    return post


def make_fused_infer(cfg, model, valid_class_ids, is_foreground,
                     max_masks=256, top_k=64, packed_example=None,
                     wire='compact', u8_colors=True):
    """One jitted call per batch: coordinate-pyramid build + SelectionNet
    forward + per-scene device post-processing, returning ONE stacked dict.

    Readback contract: every array in the returned `out` is (B, ...)-stacked;
    masks are packed over each scene's own interleaved voxel window (width
    Vs = V/B) and truncated to the best `top_k` rows, so a whole batch reads
    back in a single jax.device_get (~top_k * Vs/8 bytes per scene) with no
    further device dispatches — critical behind a high-RTT tunnel. Scenes
    with n_keep > top_k set `topk_overflow`; callers fall back to
    `fused.post_full` (the unfused full-width postproc) for those.

    `packed_example`: a numpy batch dict fixing the upload signature. When
    given, `infer` takes a SINGLE uint8 buffer (engine/hostload.py) instead
    of the batch dict — one H2D transfer per batch instead of ~50 per-array
    round-trips (measured 1.7s vs ~10ms for a 5MB ScanNet-scale batch over
    the tunnel); `infer.pack` is the host-side packer. `wire='compact'`
    (default) applies the lossless wire codecs (engine/hostload.py, ~3x
    fewer bytes); pass wire='raw' for batches whose colors are not on the
    u8 grid (e.g. color-augmented TTA batches)."""
    from box2mask_tpu.engine import state as S
    core = _make_core(cfg, valid_class_ids, is_foreground, max_masks)
    pack = unpack = None
    if packed_example is not None:
        from box2mask_tpu.engine.hostload import make_batch_packer
        pack, unpack, _ = make_batch_packer(
            packed_example, wire=wire, u8_colors=u8_colors,
            derive=os.environ.get('B2M_DERIVE_WIRE', '1') == '1')
    # With segment pooling (all shipped configs) a mask IS a set of segments
    # (batching.py lays segments out contiguously per scene), so ship the
    # segment-level bitmap — S_pad/8 bytes per row instead of Vs/8. Without
    # pooling, segments == voxels interleaved per scene; keep window packing.
    use_seg = bool(getattr(cfg, 'do_segment_pooling', True))

    @jax.jit
    def infer(params, batch_stats, batch, ths):
        if unpack is not None:
            batch = unpack(batch)
        full = S.ensure_maps(batch)
        pred = model.apply({'params': params, 'batch_stats': batch_stats},
                           full, train=False)
        B = batch['keys0_b'].shape[0] if 'keys0_b' in batch else 1
        vs = full['valid0'].shape[0] // B
        outs = []
        for b in range(B):
            o = core(pred, full, jnp.int32(b), ths,
                     vox_slice=slice(b * vs, (b + 1) * vs))
            if use_seg:
                o.pop('masks')
                o['seg_masks_packed'] = _pack_bits(o.pop('seg_masks')[:top_k])
            else:
                o.pop('seg_masks')
                o['masks_packed'] = _pack_bits(o.pop('masks')[:top_k])
            o['conf'] = o['conf'][:top_k]
            o['label_idx'] = o['label_idx'][:top_k]
            o['topk_overflow'] = o['n_keep'] > top_k
            hv = getattr(cfg, 'mlp_per_vox_semantics',
                         'mlp_per_vox_semantics')
            if hv in pred:
                # per-vox semantics argmax rides the stacked readback as u8
                # (s3dis eval consumes it; reference evaluation.py:145-164)
                o['vox_sem'] = jnp.argmax(
                    pred[hv][b * vs:(b + 1) * vs], axis=1).astype(jnp.uint8)
            outs.append(o)
        out = {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}
        return pred, out

    infer.post_full = make_device_postproc(
        cfg, valid_class_ids, is_foreground, max_masks=max_masks)
    infer.pack = pack
    if unpack is not None:
        # full batch re-materialization for the rare top_k-overflow fallback
        # (engine/infer._LazyUnpack): one extra dispatch, never on the hot path
        infer.unpack_full = jax.jit(lambda buf: S.ensure_maps(unpack(buf)))
    return infer


def _scene_result(conf, label_idx, packed, byte_off, n_vox, host,
                  valid_class_ids, scene_idx, mode):
    """packed: (n, W/8) numpy uint8 rows for one scene; byte_off is the
    scene's voxel offset within the packed width, in bytes (0 for
    window-packed rows)."""
    n = len(conf)
    label_id = np.asarray(valid_class_ids)[label_idx]
    name = host['scene'][scene_idx]['name']

    if mode == 'eval' and n:
        # fused C path: bit test + vox->point projection in one pass
        # (~10x the NumPy unpack+fancy-index chain on many-mask scenes)
        from box2mask_tpu.native import native_unpack_masks
        um = native_unpack_masks(np.ascontiguousarray(packed), byte_off,
                                 host['vox2point'][scene_idx])
        if um is not None:
            return {name: {'conf': conf,
                           'label_id': label_id.astype(np.int32),
                           'mask': um.view(np.bool_)}}

    masks = np.unpackbits(packed, axis=1, bitorder='little') if n else \
        np.zeros((0, packed.shape[1] * 8), np.uint8)
    masks = masks[:, byte_off * 8:byte_off * 8 + n_vox].astype(bool)
    if mode == 'eval':
        masks = masks[:, host['vox2point'][scene_idx]]
    return {name: {'conf': conf, 'label_id': label_id.astype(np.int32),
                   'mask': masks}}


def _warn_cap(host, scene_idx, out_np):
    if bool(out_np.get('cluster_cap_hit', False)):
        warnings.warn(
            f"scene {host['scene'][scene_idx]['name']}: NMS clustering hit "
            'the static max_masks bound — instances beyond it were dropped '
            '(raise max_masks; typical for untrained/degenerate models)')


def stacked_masks_to_results(out_np, dev, host, valid_class_ids, mode='eval',
                             post_fallback=None, pred=None, dev_j=None,
                             ths=None):
    """Host side: unpack ONE fetched (numpy) stacked fused-infer output into
    the detection_to_masks result dict for every scene of the batch.

    `out_np` must already be on host (jax.device_get(out)); this function
    performs no device calls unless a scene overflowed top_k, in which case
    `post_fallback` (fused.post_full) re-runs that scene unfused. With
    segment pooling, masks arrive as SEGMENT-level bitmaps (S_pad/8 bytes
    per row) and are projected seg->vox->point here via host
    seg2vox/vox2point; otherwise they are voxel-window bitmaps."""
    results = {}
    B = len(host['scene'])
    seg_level = 'seg_masks_packed' in out_np
    packed_key = 'seg_masks_packed' if seg_level else 'masks_packed'
    if seg_level:
        seg_off = np.concatenate(
            [[0], np.cumsum([len(il) for il in host['input_location']])])
    for si in range(B):
        n = int(out_np['n_keep'][si])
        _warn_cap(host, si, {k: v[si] for k, v in out_np.items()})
        cap = out_np[packed_key].shape[1]
        if n > cap:
            if post_fallback is None or pred is None:
                warnings.warn(
                    f"scene {host['scene'][si]['name']}: {n} masks kept but "
                    f'only {cap} packed rows shipped; result truncated')
                n = cap
            else:
                if not isinstance(dev_j, dict):    # engine/infer._LazyUnpack
                    dev_j = dict(dev_j)
                out = post_fallback(pred, dev_j, np.int32(si), ths)
                results.update(device_masks_to_results(
                    out, dev, host, valid_class_ids, si, mode=mode))
                continue
        if not seg_level:
            results.update(_scene_result(
                out_np['conf'][si][:n], out_np['label_idx'][si][:n],
                out_np['masks_packed'][si][:n], 0, host['num_voxels'][si],
                host, valid_class_ids, si, mode))
            continue
        packed = out_np['seg_masks_packed'][si][:n]
        segm = np.unpackbits(packed, axis=1, bitorder='little') if n else \
            np.zeros((0, packed.shape[1] * 8), np.uint8)
        lo, hi = seg_off[si], seg_off[si + 1]
        segm = segm[:, lo:hi].astype(bool)               # (n, n_seg_i)
        s2v = np.asarray(host['seg2vox'][si])            # (n_vox_i,) local
        if mode == 'eval':
            # one fused seg->point gather instead of seg->vox then
            # vox->point: the (n, n_points) bool gather dominates host
            # unpack time (scripts/profile_pipeline.py), so halve it;
            # the composite index is memoized per scene
            cache = host.setdefault('_seg2point', {})
            idx = cache.get(si)
            if idx is None:
                idx = cache[si] = s2v[np.asarray(host['vox2point'][si])]
            masks = segm[:, idx] if n else np.zeros((0, len(idx)), bool)
        else:
            masks = segm[:, s2v] if n else np.zeros(
                (0, len(s2v)), bool)                     # (n, n_vox_i)
        name = host['scene'][si]['name']
        label_id = np.asarray(valid_class_ids)[out_np['label_idx'][si][:n]]
        results[name] = {'conf': out_np['conf'][si][:n],
                         'label_id': label_id.astype(np.int32),
                         'mask': masks}
    return results


def device_masks_to_results(out, dev, host, valid_class_ids, scene_idx,
                            mode='eval'):
    """Host side: unpack the device result for one scene (full-width packed
    rows from make_device_postproc) into the detection_to_masks result dict
    {conf, label_id, mask} (points in eval mode, voxels otherwise).

    `out` may hold device arrays: only n_keep (4 bytes) and a
    power-of-2-bucketed row slice of the packed masks are read back."""
    n, conf_all, label_all = jax.device_get(
        (out['n_keep'], out['conf'], out['label_idx']))   # one small transfer
    n = int(n)
    if 'cluster_cap_hit' in out:
        _warn_cap(host, scene_idx,
                  {'cluster_cap_hit': jax.device_get(out['cluster_cap_hit'])})
    cap = out['masks_packed'].shape[0]
    nb = 1
    while nb < max(n, 1):
        nb *= 2
    nb = min(nb, cap)
    conf = np.asarray(conf_all)[:n]
    label_idx = np.asarray(label_all)[:n]
    packed = np.asarray(out['masks_packed'][:nb])[:n]

    n_vox = host['num_voxels'][scene_idx]
    if 'interleaved_vs' in host:                 # device-maps layout
        vs = host['interleaved_vs']
        start = scene_idx * vs
    else:                                        # host-maps: tail-padded concat
        start = int(np.sum(host['num_voxels'][:scene_idx]))
    if start % 8 == 0:
        return _scene_result(conf, label_idx, packed, start // 8, n_vox,
                             host, valid_class_ids, scene_idx, mode)
    # unaligned start: fall back to full unpack + python slice
    masks = np.unpackbits(packed, axis=1, bitorder='little') if n else \
        np.zeros((0, packed.shape[1] * 8), np.uint8)
    masks = masks[:, start:start + n_vox].astype(bool)
    if mode == 'eval':
        masks = masks[:, host['vox2point'][scene_idx]]
    name = host['scene'][scene_idx]['name']
    label_id = np.asarray(valid_class_ids)[label_idx]
    return {name: {'conf': conf, 'label_id': label_id.astype(np.int32),
                   'mask': masks}}
