"""Loss semantics vs hand computation (reference formulas, models/model.py:38-225)."""

import numpy as np
import jax.numpy as jnp

from box2mask_tpu.config import get_config
from box2mask_tpu.nn import losses as L


def make_cfg():
    return get_config([
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics', '--bb_supervision', '--do_segment_pooling',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '2',
        '--loss_weight_semantics', '1', '--use_bb_iou_loss',
        '--loss_weight_bb_iou', '0.25'])


def test_losses_match_manual_math():
    cfg = make_cfg()
    rng = np.random.default_rng(0)
    S = 32
    fg = np.zeros(S, bool)
    fg[:10] = True
    valid = np.zeros(S, bool)
    valid[:20] = True
    loc = rng.normal(size=(S, 3)).astype(np.float32)
    gt_off = rng.normal(size=(S, 3)).astype(np.float32)
    gt_bnd = np.abs(rng.normal(size=(S, 3))).astype(np.float32) + 0.1
    gt_idx = rng.integers(0, 20, S).astype(np.int32)
    gt_idx[15:] = -100
    pred = {
        'mlp_offsets': jnp.asarray(rng.normal(size=(S, 3)).astype(np.float32)),
        'mlp_bounds': jnp.asarray(
            np.abs(rng.normal(size=(S, 3))).astype(np.float32) + 0.1),
        'mlp_bb_scores': jnp.asarray(rng.normal(size=(S, 1)).astype(np.float32)),
        'mlp_semantics': jnp.asarray(rng.normal(size=(S, 20)).astype(np.float32)),
    }
    batch = {'seg_valid': jnp.asarray(valid), 'fg_instances': jnp.asarray(fg),
             'input_location': jnp.asarray(loc),
             'gt_bb_offsets': jnp.asarray(gt_off),
             'gt_bb_bounds': jnp.asarray(gt_bnd),
             'gt_semantics_idx': jnp.asarray(gt_idx)}
    ld = L.compute_losses(cfg, pred, batch, jnp.float32(2.0), jnp.float32(0.0))

    m = fg & valid
    want_off = np.abs(np.asarray(pred['mlp_offsets']) - gt_off).sum(1)[m].mean()
    np.testing.assert_allclose(float(ld['offset_loss']), want_off, rtol=1e-5)
    want_bnd = np.abs(np.asarray(pred['mlp_bounds']) - gt_bnd).sum(1)[m].mean()
    np.testing.assert_allclose(float(ld['bounds_loss']), want_bnd, rtol=1e-5)

    # bb score target = IoU(gt box, clamped pred box); BCE-with-logits
    pb = np.clip(np.asarray(pred['mlp_bounds']), cfg.min_bb_size, None)
    pc = np.asarray(pred['mlp_offsets']) + loc
    gc = gt_off + loc
    pr = np.concatenate([pc - pb, pc + pb], 1)
    gt = np.concatenate([gc - gt_bnd, gc + gt_bnd], 1)
    imin = np.maximum(pr[:, :3], gt[:, :3])
    imax = np.minimum(pr[:, 3:], gt[:, 3:])
    inter = np.prod(np.clip(imax - imin, 0, None), 1)
    union = (np.prod(2 * pb, 1) + np.prod(2 * gt_bnd, 1) - inter + 1e-6)
    iou = inter / union
    s = np.asarray(pred['mlp_bb_scores'])[:, 0]
    bce = np.maximum(s, 0) - s * iou + np.log1p(np.exp(-np.abs(s)))
    np.testing.assert_allclose(float(ld['bb_score_loss']), bce[m].mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ld['iou_loss']), (1 - iou)[m].mean(),
                               rtol=1e-5)

    # semantics CE with -100 ignore (only valid & labeled entries)
    logits = np.asarray(pred['mlp_semantics'])
    logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    lm = valid & (gt_idx >= 0)
    want_ce = -logp[np.arange(S), np.clip(gt_idx, 0, 19)][lm].mean()
    np.testing.assert_allclose(float(ld['semantics_loss']), want_ce, rtol=1e-4)

    # weighted total with bb_w=2 override
    want_total = (1.0 * want_off + 0.5 * want_bnd + 2.0 * bce[m].mean()
                  + 1.0 * want_ce + 0.25 * (1 - iou)[m].mean())
    np.testing.assert_allclose(float(ld['optimization_loss']), want_total,
                               rtol=1e-4)


def test_delayed_start_weight_zeroes_score_loss():
    cfg = make_cfg()
    from box2mask_tpu.engine.state import head_weights
    cfg.mlp_bb_scores_start_epoch = 100
    assert head_weights(cfg, 50) == (0.0, 0.0)
    assert head_weights(cfg, 100)[0] == 2.0
