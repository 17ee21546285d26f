"""Pure-JAX loss suite for the detection net.

Semantics-parity with the reference's compute_loss_detection
(models/model.py:38-225): masked L1 offset/bounds losses over foreground
oversegments, optional axis-aligned IoU loss, BCE bb-score loss against detached
per-vote IoU targets (delayed start epoch), L1 center-score loss against the
detached offset loss, cross-entropy semantic losses with -100 ignore labels, plus
interpretable logging signals (pearson correlations, accuracy, mIoU) — all as one
jit-able function over the padded batch (padding rows masked exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x, mask):
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def pearson(x, y, mask):
    """Pearson correlation over masked entries (logging only;
    reference uses scipy.stats.pearsonr on host, models/model.py:170)."""
    m = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mx, my = jnp.sum(x * m) / n, jnp.sum(y * m) / n
    dx, dy = (x - mx) * m, (y - my) * m
    cov = jnp.sum(dx * dy)
    sx = jnp.sqrt(jnp.sum(dx * dx))
    sy = jnp.sqrt(jnp.sum(dy * dy))
    return cov / jnp.maximum(sx * sy, 1e-8)


def aabb_iou(bbs_a, bbs_b, eps=1e-6):
    """Pairwise-aligned IoU of (N,6) [min,max] boxes (reference iou_nms.py:4-22)."""
    imin = jnp.maximum(bbs_a[:, :3], bbs_b[:, :3])
    imax = jnp.minimum(bbs_a[:, 3:], bbs_b[:, 3:])
    inter = jnp.prod(jnp.clip(imax - imin, 0.0, None), axis=1)
    va = jnp.prod(bbs_a[:, 3:] - bbs_a[:, :3], axis=1)
    vb = jnp.prod(bbs_b[:, 3:] - bbs_b[:, :3], axis=1)
    return inter / (va + vb - inter + eps)


def to_min_max(centers, bounds):
    return jnp.concatenate([centers - bounds, centers + bounds], axis=1)


def softmax_xent(logits, labels, valid):
    """CE with ignore labels (labels < 0 masked; reference CrossEntropyLoss
    ignore_index=-100, models/model.py:31)."""
    mask = (labels >= 0) & valid
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    return masked_mean(nll, mask), mask


def sem_miou(pred_idx, gt_idx, valid, num_classes):
    """Mean IoU over classes present in gt or pred (reference iou_nms.py:146-157)."""
    v = valid & (gt_idx >= 0)
    ious, present = [], []
    for c in range(num_classes):
        p = (pred_idx == c) & v
        g = (gt_idx == c) & v
        inter = jnp.sum(p & g)
        union = jnp.sum(p | g)
        ious.append(inter / (union + 1e-6))
        present.append(union > 0)
    ious = jnp.stack(ious)
    present = jnp.stack(present).astype(jnp.float32)
    return jnp.sum(ious * present) / jnp.maximum(jnp.sum(present), 1.0)


def compute_losses(cfg, pred, batch, bb_score_weight, center_score_weight):
    """Weighted loss dict. `bb_score_weight` / `center_score_weight` are traced
    scalars implementing the delayed-start epochs (models/model.py:136-137,179)
    without retracing."""
    heads = cfg.network_heads
    losses = {}
    opt_loss = 0.0

    seg_valid = batch['seg_valid']
    fg = batch['fg_instances'] & seg_valid
    if not cfg.loss_on_fg_instances and not cfg.bb_supervision:
        fg = seg_valid

    loc = batch['input_location']
    gt_off = batch['gt_bb_offsets']
    gt_bnd = batch['gt_bb_bounds']

    offset_l1 = None
    if cfg.mlp_offsets in heads:
        offset_l1 = jnp.sum(jnp.abs(pred[cfg.mlp_offsets] - gt_off), axis=1)
        offset_loss = masked_mean(offset_l1, fg)
        opt_loss += cfg.loss_weight_bb_offsets * offset_loss
        losses['offset_loss'] = offset_loss

    if cfg.mlp_bounds in heads:
        bounds_l1 = jnp.sum(jnp.abs(pred[cfg.mlp_bounds] - gt_bnd), axis=1)
        bounds_loss = masked_mean(bounds_l1, fg)
        opt_loss += cfg.loss_weight_bb_bounds * bounds_loss
        losses['bounds_loss'] = bounds_loss

    if cfg.use_bb_iou_loss:
        pb = jnp.clip(pred[cfg.mlp_bounds], cfg.min_bb_size, None)
        pr = to_min_max(pred[cfg.mlp_offsets] + loc, pb)
        gt = to_min_max(gt_off + loc, gt_bnd)
        ious = aabb_iou(pr, gt)
        iou_loss = masked_mean(1.0 - ious, fg)
        opt_loss += cfg.loss_weight_bb_iou * iou_loss
        losses['iou_loss'] = iou_loss

    if cfg.mlp_bb_scores in heads:
        scores = pred[cfg.mlp_bb_scores][:, 0]
        pb = jnp.clip(pred[cfg.mlp_bounds], cfg.min_bb_size, None)
        pr = to_min_max(pred[cfg.mlp_offsets] + loc, pb)
        gt = to_min_max(gt_off + loc, gt_bnd)
        target = jax.lax.stop_gradient(aabb_iou(gt, pr))
        bce = jnp.maximum(scores, 0) - scores * target + jnp.log1p(
            jnp.exp(-jnp.abs(scores)))
        score_loss = masked_mean(bce, fg)
        opt_loss += bb_score_weight * score_loss
        losses['bb_score_loss'] = score_loss
        losses['bb_target_scores'] = masked_mean(target, fg)
        losses['bb_scores_correlation'] = pearson(target, scores, fg)

    if cfg.mlp_center_scores in heads and offset_l1 is not None:
        scores = pred[cfg.mlp_center_scores][:, 0]
        gt_scores = jax.lax.stop_gradient(offset_l1)
        cs_mask = fg if cfg.loss_on_fg_instances else seg_valid
        cs_loss = masked_mean(jnp.abs(scores - gt_scores), cs_mask)
        opt_loss += center_score_weight * cs_loss
        losses['center_score_loss'] = cs_loss
        losses['center_scores_correlation'] = pearson(gt_scores, scores, cs_mask)

    if cfg.mlp_semantics in heads:
        logits = pred[cfg.mlp_semantics]
        gt_idx = batch['gt_semantics_idx']     # already id->index mapped, -100 ignore
        sem_loss, sem_mask = softmax_xent(logits, gt_idx, seg_valid)
        pred_idx = jnp.argmax(logits, axis=1)
        acc = masked_mean((pred_idx == gt_idx).astype(jnp.float32), seg_valid)
        opt_loss += cfg.loss_weight_semantics * sem_loss
        losses['semantics_loss'] = sem_loss
        losses['semantics_acc'] = acc
        losses['semantics_mIoU'] = sem_miou(pred_idx, gt_idx, seg_valid,
                                            logits.shape[-1])

    if cfg.mlp_per_vox_semantics in heads:
        logits = pred[cfg.mlp_per_vox_semantics]
        gt_idx = batch['gt_per_vox_semantics_idx']
        vvalid = batch['valid0']
        pv_loss, _ = softmax_xent(logits, gt_idx, vvalid)
        pred_idx = jnp.argmax(logits, axis=1)
        pv_acc = masked_mean((pred_idx == gt_idx).astype(jnp.float32), vvalid)
        opt_loss += cfg.loss_weight_per_vox_semantics * pv_loss
        losses['per_vox_semantics_loss'] = pv_loss
        losses['per_vox_semantics_acc'] = pv_acc

    losses['optimization_loss'] = opt_loss
    return losses
