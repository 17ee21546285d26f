"""Non-maximum *clustering* of box votes + mask NMS.

The reference implements both as data-dependent Python while-loops over torch
tensors (models/iou_nms.py:68-105 NMS_clustering, :130-144 mask_NMS). Here:

  * `nms_clustering_np` — exact-semantics NumPy version (eval oracle): greedy by
    score; each representative's IoU row vs ALL boxes is its cluster "heatmap"
    (rep entry forced to 1); boxes with IoU > cluster_th are suppressed into the
    cluster.
  * `nms_clustering_jax` — jit-able `lax.while_loop` with a static cluster bound:
    each step is one vectorized IoU row + masked argmax (VPU-friendly), no host
    sync. Returns fixed-shape (R_max,) reps + (R_max, N) heatmaps + count.
  * `mask_nms_np` / `mask_nms_jax` — greedy mask dedup by mask IoU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.postprocess import iou as I


def nms_clustering_np(boxes, cluster_th=0.5, get_heatmaps=True,
                      matrix_threshold=4000):
    """boxes: (N,7) [score, min, max]. Returns (reps, clusters, heatmaps).

    For N <= matrix_threshold all pairwise IoUs are computed once as a matrix
    and the greedy loop runs on its rows (no per-iteration IoU recompute);
    above it, rows are computed lazily to bound memory."""
    assert boxes.ndim == 2 and boxes.shape[1] == 7
    assert 0 < cluster_th < 1
    boxes = np.asarray(boxes, np.float64)
    side = boxes[:, 4:] - boxes[:, 1:4]
    if not (side.min(axis=1) > 0).all():
        print('Warning: Invalid boxes found.')
    order = np.argsort(-boxes[:, 0], kind='stable')
    geo = boxes[:, 1:]
    N = len(boxes)
    iou_matrix = None
    if N and N <= matrix_threshold:
        imin = np.maximum(geo[:, None, :3], geo[None, :, :3])
        imax = np.minimum(geo[:, None, 3:], geo[None, :, 3:])
        inter = np.prod(np.clip(imax - imin, 0, None), axis=2)
        vol = np.prod(geo[:, 3:] - geo[:, :3], axis=1)
        iou_matrix = inter / (vol[:, None] + vol[None, :] - inter + I.EPS)
    reps, clusters, heatmaps = [], [], []
    remaining = order
    while len(remaining):
        top = remaining[0]
        row = (iou_matrix[top].copy() if iou_matrix is not None
               else I.one_vs_all_ious_np(geo[top], geo))
        row[top] = 1.0
        ious = row[remaining]
        keep = ious <= cluster_th
        reps.append(top)
        clusters.append(remaining[~keep])
        if get_heatmaps:
            heatmaps.append(row)
        remaining = remaining[keep]
    reps = np.array(reps, np.int64)
    if get_heatmaps:
        hm = np.stack(heatmaps, 0) if heatmaps else np.zeros((0, len(boxes)))
        return reps, clusters, hm
    return reps, clusters


def nms_clustering_jax(boxes, valid, cluster_th=0.5, max_clusters=256,
                       return_overflow=False):
    """Static-shape device version.

    boxes: (N, 7) [score, min, max]; valid: (N,) bool (padding excluded).
    Returns (reps (R,), heatmaps (R, N), rep_valid (R,)). Semantics match
    nms_clustering_np on valid rows (up to the static cluster bound).
    With return_overflow=True also returns a bool scalar that is True when
    the static bound truncated the clustering (boxes remained unclustered —
    the reference loop at models/iou_nms.py:84-100 is unbounded, so a hit
    means instances were silently dropped).
    """
    N = boxes.shape[0]
    scores = jnp.where(valid, boxes[:, 0], -jnp.inf)
    geo = boxes[:, 1:]

    def body(state):
        r, remaining, reps, heatmaps, repv = state
        top = jnp.argmax(jnp.where(remaining, scores, -jnp.inf))
        row = I.one_vs_all_ious(geo[top], geo)
        row = row.at[top].set(1.0)
        new_remaining = remaining & (row <= cluster_th)
        reps = reps.at[r].set(top)
        heatmaps = heatmaps.at[r].set(row)
        repv = repv.at[r].set(True)
        return r + 1, new_remaining, reps, heatmaps, repv

    def cond(state):
        r, remaining, *_ = state
        return (r < max_clusters) & jnp.any(remaining)

    init = (jnp.int32(0), valid,
            jnp.zeros(max_clusters, jnp.int32),
            jnp.zeros((max_clusters, N), jnp.float32),
            jnp.zeros(max_clusters, bool))
    _, remaining, reps, heatmaps, repv = jax.lax.while_loop(cond, body, init)
    if return_overflow:
        return reps, heatmaps, repv, jnp.any(remaining)
    return reps, heatmaps, repv


def mask_nms_np(sorted_masks, cluster_th=0.5, allow_empty=False):
    """Greedy mask dedup; input masks sorted by confidence. Returns kept indices."""
    remaining = np.arange(len(sorted_masks))
    kept, suppressed = [], []
    while len(remaining):
        top = remaining[0]
        ious = I.masks_iou_np(sorted_masks[top], sorted_masks[remaining], allow_empty)
        ious[0] = 1.0
        keep = ious <= cluster_th
        kept.append(top)
        suppressed.append((top, remaining[~keep]))
        remaining = remaining[keep]
    return np.array(kept, np.int64), suppressed


def mask_nms_matrix(sorted_masks, cluster_th=0.5):
    """Exact mask_nms_np semantics, but all pairwise IoUs are computed once via
    one f32 matmul (R^2*V flops) and the greedy loop runs on the R x R matrix —
    removes the O(R^2*V) python re-scan that dominated post-processing."""
    R = len(sorted_masks)
    if R == 0:
        return np.zeros(0, np.int64), []
    M = np.asarray(sorted_masks, np.float32)
    inter = M @ M.T
    areas = np.diag(inter).copy()
    union = areas[:, None] + areas[None, :] - inter
    iou = np.divide(inter, union, out=np.zeros_like(inter), where=union > 0)
    np.fill_diagonal(iou, 1.0)
    remaining = np.ones(R, bool)
    kept, suppressed = [], []
    while remaining.any():
        top = int(np.argmax(remaining))
        keep = iou[top] <= cluster_th
        kept.append(top)
        suppressed.append((top, np.nonzero(remaining & ~keep)[0]))
        remaining &= keep
    return np.array(kept, np.int64), suppressed


def mask_nms_jax(masks, valid, cluster_th=0.5):
    """masks: (R, V) bool sorted by confidence; valid: (R,). Returns keep (R,)."""
    R = masks.shape[0]
    idx = jnp.arange(R)

    def body(state):
        remaining, keep = state
        top = jnp.argmax(jnp.where(remaining, R - idx, 0))  # smallest remaining idx
        ious = I.masks_iou(masks[top], masks)
        ious = ious.at[top].set(1.0)
        keep = keep.at[top].set(True)
        remaining = remaining & (ious <= cluster_th)
        return remaining, keep

    def cond(state):
        remaining, _ = state
        return jnp.any(remaining)

    remaining, keep = jax.lax.while_loop(cond, body, (valid, jnp.zeros(R, bool)))
    return keep
