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

Only scalar metadata + packed masks leave the chip. `device_masks_to_results`
unpacks on the host and projects vox->point, returning the same result dict as
detection_to_masks(mode='eval').
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.postprocess import nms


def make_device_postproc(cfg, valid_class_ids, is_foreground, max_masks=256):
    """Returns jitted fn(pred, batch, scene_idx, ths) -> compact result dict.

    `scene_idx` and the 4 thresholds are traced (no recompile per scene or per
    param-search point); `max_masks` is the static cluster bound (reference has
    no bound; trained models produce far fewer clusters than 256)."""
    ids = np.asarray(valid_class_ids)
    fg_lut = jnp.asarray(np.asarray(is_foreground(ids)).astype(bool))
    min_bb = cfg.min_bb_size
    off_h, bnd_h = cfg.mlp_offsets, cfg.mlp_bounds
    score_h, sem_h = cfg.mlp_bb_scores, cfg.mlp_semantics

    @jax.jit
    def post(pred, batch, scene_idx, ths):
        cluster_th, score_th, mask_bin_th, mask_nms_th = ths
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

        reps, heatmaps, repv = nms.nms_clustering_jax(
            boxes, fg, cluster_th=cluster_th, max_clusters=max_masks)
        rep_scores = boxes[reps, 0]
        keep0 = repv & (rep_scores > score_th)
        # zero heatmap over background segments (detection2mask hm_w_bg)
        heatmaps = heatmaps * fg[None, :].astype(heatmaps.dtype)

        pool = batch['pooling_ids']                      # (V,) voxel -> segment
        vox_ok = (batch['valid0'] & (batch['batch0'] == scene_idx)
                  & (pool < S))
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
            remaining, keep = state
            top = jnp.argmax(jnp.where(remaining, R - idx, 0))
            keep = keep.at[top].set(True)
            row = iou[top].at[top].set(1.0)
            remaining = remaining & (row <= mask_nms_th)
            return remaining, keep

        def cond(state):
            remaining, _ = state
            return jnp.any(remaining)

        _, keep = jax.lax.while_loop(cond, body, (keep0, jnp.zeros(R, bool)))

        # per-mask majority-vote semantics: counts = mask @ one_hot(vox_sem)
        vox_sem = sem_idx[pool_c]
        onehot = jax.nn.one_hot(vox_sem, fg_lut.shape[0], dtype=jnp.bfloat16)
        counts = jax.lax.dot_general(
            M, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (R, C)
        label_idx = jnp.argmax(counts, axis=1).astype(jnp.int32)

        # compact kept rows to the front (stable: preserves score-desc order)
        order = jnp.argsort(~keep, stable=True)
        masks = masks_t.T[order]                         # (R, V)
        V = masks.shape[1]
        w = jnp.left_shift(jnp.uint8(1),
                           jnp.arange(8, dtype=jnp.uint8)[None, None, :])
        packed = jnp.sum(masks.reshape(R, V // 8, 8).astype(jnp.uint8) * w,
                         axis=-1).astype(jnp.uint8)
        return {'n_keep': jnp.sum(keep).astype(jnp.int32),
                'conf': rep_scores[order],
                'label_idx': label_idx[order],
                'masks_packed': packed}

    return post


def make_fused_infer(cfg, model, valid_class_ids, is_foreground,
                     max_masks=256):
    """One jitted call per batch: coordinate-pyramid build + SelectionNet
    forward + per-scene device post-processing. Cuts host->device dispatches
    to 1/batch — significant when the device sits behind a high-RTT tunnel."""
    from box2mask_tpu.engine import state as S
    post = make_device_postproc(cfg, valid_class_ids, is_foreground,
                                max_masks=max_masks)

    @jax.jit
    def infer(params, batch_stats, batch, ths):
        full = S.ensure_maps(batch)
        pred = model.apply({'params': params, 'batch_stats': batch_stats},
                           full, train=False)
        B = batch['keys0_b'].shape[0] if 'keys0_b' in batch else 1
        outs = [post(pred, full, jnp.int32(b), ths) for b in range(B)]
        return pred, outs

    return infer


def device_masks_to_results(out, dev, host, valid_class_ids, scene_idx,
                            mode='eval'):
    """Host side: unpack the device result for one scene into the
    detection_to_masks result dict {conf, label_id, mask} (points in eval
    mode, voxels otherwise).

    `out` may hold device arrays: only n_keep (4 bytes) and a
    power-of-2-bucketed row slice of the packed masks are read back — the
    device sits behind a high-RTT/low-BW tunnel, so shipping all max_masks
    rows (4MB/scene) would dominate the scene wall time."""
    import jax
    n, conf_all, label_all = jax.device_get(
        (out['n_keep'], out['conf'], out['label_idx']))   # one small transfer
    n = int(n)
    cap = out['masks_packed'].shape[0]
    nb = 1
    while nb < max(n, 1):
        nb *= 2
    nb = min(nb, cap)
    conf = np.asarray(conf_all)[:n]
    label_id = np.asarray(valid_class_ids)[np.asarray(label_all)[:n]]
    packed = np.asarray(out['masks_packed'][:nb])[:n]

    n_vox = host['num_voxels'][scene_idx]
    if 'interleaved_vs' in host:                 # device-maps layout
        vs = host['interleaved_vs']
        sl = slice(scene_idx * vs, scene_idx * vs + n_vox)
    else:                                        # host-maps: tail-padded concat
        off = int(np.sum(host['num_voxels'][:scene_idx]))
        sl = slice(off, off + n_vox)
    name = host['scene'][scene_idx]['name']

    if mode == 'eval' and n and sl.start % 8 == 0:
        # fused C path: bit test + vox->point projection in one pass
        # (~10x the NumPy unpack+fancy-index chain on many-mask scenes)
        from box2mask_tpu.native import native_unpack_masks
        um = native_unpack_masks(packed, sl.start // 8,
                                 host['vox2point'][scene_idx])
        if um is not None:
            return {name: {'conf': conf,
                           'label_id': label_id.astype(np.int32),
                           'mask': um.view(np.bool_)}}

    masks = np.unpackbits(packed, axis=1, bitorder='little') if n else \
        np.zeros((0, packed.shape[1] * 8), np.uint8)
    masks = masks[:, sl].astype(bool)
    if mode == 'eval':
        masks = masks[:, host['vox2point'][scene_idx]]
    return {name: {'conf': conf, 'label_id': label_id.astype(np.int32),
                   'mask': masks}}
