"""On-device coordinate-map builder vs the host oracle (sparse/coords.py)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from box2mask_tpu.sparse import coords as C
from box2mask_tpu.sparse import device_maps as DM
from box2mask_tpu.postprocess import nms


def random_coords(n, hi=200, seed=0):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, hi, size=(n, 3)), axis=0).astype(np.int32)


def normalize(m, sent):
    return np.where(np.asarray(m) == sent, -1, np.asarray(m))


def test_single_scene_maps_match_host():
    c = random_coords(600, seed=0)
    host = C.build_scene_pyramid(c)
    pads = DM.level_pads_for_scenes([c], vox_bucket=256, min_pad=64)
    coords_b = np.full((1, pads[0], 3), -1, np.int32)
    coords_b[0, :len(c)] = c
    dev = DM.build_batch_maps(jnp.asarray(coords_b), pads)
    for l in range(8):
        n = int(host[f'num{l}'])
        assert int(dev[f'num{l}']) == n
        np.testing.assert_array_equal(np.asarray(dev[f'coords{l}'])[:n],
                                      host[f'coords{l}'])
        got = normalize(np.asarray(dev[f'nmap3_{l}'])[:n], pads[l])
        np.testing.assert_array_equal(got, host[f'nmap3_{l}'])
    got5 = normalize(np.asarray(dev['nmap5_0'])[:int(host['num0'])], pads[0])
    np.testing.assert_array_equal(got5, host['nmap5_0'])
    for l in range(7):
        n1 = int(host[f'num{l + 1}'])
        got = normalize(np.asarray(dev[f'down{l}'])[:n1], pads[l])
        np.testing.assert_array_equal(got, host[f'down{l}'])
        n = int(host[f'num{l}'])
        np.testing.assert_array_equal(
            normalize(np.asarray(dev[f'up_parent{l}'])[:n], pads[l + 1]),
            host[f'up_parent{l}'])
        np.testing.assert_array_equal(np.asarray(dev[f'up_widx{l}'])[:n],
                                      host[f'up_widx{l}'])


def test_batched_maps_globalization():
    c1, c2 = random_coords(300, seed=1), random_coords(400, seed=2)
    pads = DM.level_pads_for_scenes([c1, c2], vox_bucket=256, min_pad=64)
    Vs = pads[0]
    coords_b = np.full((2, Vs, 3), -1, np.int32)
    coords_b[0, :len(c1)] = c1
    coords_b[1, :len(c2)] = c2
    dev = DM.build_batch_maps(jnp.asarray(coords_b), pads)
    h2 = C.build_scene_pyramid(c2)
    n2 = int(h2['num0'])
    m = np.asarray(dev['nmap3_0'])[Vs:Vs + n2]
    sent = 2 * Vs
    want = np.where(h2['nmap3_0'] < 0, sent, h2['nmap3_0'] + Vs)
    np.testing.assert_array_equal(m, want)
    # validity masks interleaved per scene
    v = np.asarray(dev['valid0'])
    assert v[:len(c1)].all() and not v[len(c1):Vs].any()
    assert v[Vs:Vs + n2].all() and not v[Vs + n2:].any()
    assert int(dev['num0']) == len(c1) + n2


def test_forward_equivalence_host_vs_device_maps():
    """Full network forward must be identical under both batch layouts."""
    import jax
    from tests.test_model_forward import make_cfg, make_batch
    from box2mask_tpu.datasets import synthetic, supervision
    from box2mask_tpu.datasets.voxelize import voxelize_scene
    from box2mask_tpu.datasets.batching import build_batch
    from box2mask_tpu.datasets.tables import get_tables
    from box2mask_tpu.engine import state as S

    cfg = make_cfg()
    _, sem_id2idx, _, _ = get_tables('scannet')
    rets = []
    for s in (3, 4):
        scene, labels = synthetic.make_scene(seed=s, num_instances=3,
                                             points_per_instance=150,
                                             floor_points=600, wall_points=400)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
        rets.append(ret)
    dev_host, _ = build_batch(rets, cfg, sem_id2idx, device_maps=False)
    dev_small, _ = build_batch(rets, cfg, sem_id2idx, device_maps=True)
    assert 'keys0_b' in dev_small and 'nmap3_0' not in dev_small

    model = S.build_model(cfg, num_classes=20)
    fwd = S.make_forward(cfg, model)
    bh = {k: jnp.asarray(v) for k, v in dev_host.items()}
    bs = {k: jnp.asarray(v) for k, v in dev_small.items()}
    variables = S.init_variables(model, bh)
    out_h = fwd(variables['params'], variables['batch_stats'], bh)
    out_s = fwd(variables['params'], variables['batch_stats'], bs)
    Sv = int(dev_host['num_segments'])
    for k in out_h:
        np.testing.assert_allclose(np.asarray(out_h[k])[:Sv],
                                   np.asarray(out_s[k])[:Sv],
                                   rtol=2e-4, atol=2e-4)


def test_mask_nms_matrix_matches_loop():
    rng = np.random.default_rng(0)
    masks = rng.uniform(size=(25, 300)) < 0.25
    kept_loop, _ = nms.mask_nms_np(masks, 0.5, allow_empty=True)
    kept_mat, _ = nms.mask_nms_matrix(masks, 0.5)
    np.testing.assert_array_equal(kept_loop, kept_mat)


def test_maps_at_coordinate_extremes():
    """z-run lookup near field boundaries (z=0 underflow borrow, z=1023)."""
    rng = np.random.default_rng(9)
    lo = rng.integers(0, 4, (150, 3))
    hi = 1023 - rng.integers(0, 4, (150, 3))
    mix = np.concatenate([lo, hi, rng.integers(0, 1024, (200, 3))])
    c = np.unique(mix, axis=0).astype(np.int32)
    host = C.build_scene_pyramid(c)
    pads = DM.level_pads_for_scenes([c], vox_bucket=512, min_pad=64)
    coords_b = np.full((1, pads[0], 3), -1, np.int32)
    coords_b[0, :len(c)] = c
    dev = DM.build_batch_maps(jnp.asarray(coords_b), pads)
    for l in range(8):
        n = int(host[f'num{l}'])
        got = normalize(np.asarray(dev[f'nmap3_{l}'])[:n], pads[l])
        np.testing.assert_array_equal(got, host[f'nmap3_{l}'])
    got5 = normalize(np.asarray(dev['nmap5_0'])[:int(host['num0'])], pads[0])
    np.testing.assert_array_equal(got5, host['nmap5_0'])


def test_forward_equivalence_key_conv():
    """Full network forward with key_conv window plans (interpret-mode pallas)
    must match the nmap device-maps forward."""
    from tests.test_model_forward import make_cfg
    from box2mask_tpu.datasets import synthetic, supervision
    from box2mask_tpu.datasets.voxelize import voxelize_scene
    from box2mask_tpu.datasets.batching import build_batch
    from box2mask_tpu.datasets.tables import get_tables
    from box2mask_tpu.engine import state as S

    cfg = make_cfg(['--vox_bucket', '128', '--key_conv_force'])
    cfg_nmap = make_cfg(['--vox_bucket', '128', '--key_conv', 'off'])
    _, sem_id2idx, _, _ = get_tables('scannet')
    rets = []
    for s in (3, 4):
        scene, labels = synthetic.make_scene(seed=s, num_instances=3,
                                             points_per_instance=150,
                                             floor_points=600, wall_points=400)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
        rets.append(ret)
    dev_nmap, _ = build_batch(rets, cfg_nmap, sem_id2idx, mode='train',
                              device_maps=True)
    dev_kc, _ = build_batch(rets, cfg, sem_id2idx, mode='val',
                            device_maps=True)
    assert 'kc3_base0' in dev_kc and 'kc3_base0' not in dev_nmap
    # kc batches ship NO up_parent (kcu plans + in-jit up_widx cover the
    # transpose; ~15% wire win, round-4 verdict #5)
    assert 'up_parent0' not in dev_kc and 'kcu_base0' in dev_kc

    model = S.build_model(cfg, num_classes=20)
    fwd = S.make_forward(cfg, model)
    bn = {k: jnp.asarray(v) for k, v in dev_nmap.items()}
    bk = {k: jnp.asarray(v) for k, v in dev_kc.items()}
    variables = S.init_variables(model, bn)
    out_n = fwd(variables['params'], variables['batch_stats'], bn)
    out_k = fwd(variables['params'], variables['batch_stats'], bk)
    Sv = int(dev_nmap['num_segments'])
    for k in out_n:
        np.testing.assert_allclose(np.asarray(out_n[k])[:Sv],
                                   np.asarray(out_k[k])[:Sv],
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(os.environ.get('B2M_SLOW_TESTS') != '1',
                    reason='~4 min of interpret-mode pallas (~120 kernel '
                           'invocations); the backward math is covered by '
                           'test_key_conv grad tests, and scripts/'
                           'check_train_key_conv.py runs this on real TPU')
def test_train_step_key_conv_path():
    """One train step through key_conv_train custom-VJP convs (interpret):
    finite loss + parameter change."""
    import jax
    from tests.test_model_forward import make_cfg
    from box2mask_tpu.datasets import synthetic, supervision
    from box2mask_tpu.datasets.voxelize import voxelize_scene
    from box2mask_tpu.datasets.batching import build_batch
    from box2mask_tpu.datasets.tables import get_tables
    from box2mask_tpu.engine import state as S

    cfg = make_cfg(['--vox_bucket', '128', '--key_conv', 'on',
                    '--key_conv_force'])
    _, sem_id2idx, _, _ = get_tables('scannet')
    scene, labels = synthetic.make_scene(seed=5, num_instances=2,
                                         points_per_instance=80,
                                         floor_points=300, wall_points=200)
    ret = voxelize_scene(scene, cfg)
    ret['labels'] = labels
    supervision.build_supervision(ret, labels, scene, cfg, 'scannet')
    dev, _ = build_batch([ret], cfg, sem_id2idx, mode='train',
                         device_maps=True)
    assert 'kc3_base0' in dev
    batch = {k: jnp.asarray(v) for k, v in dev.items()}
    model = S.build_model(cfg, num_classes=20)
    tx = S.make_optimizer(cfg)
    state = S.init_state(cfg, model, tx, batch)
    step = S.make_train_step(cfg, model, tx, donate=False)
    lr = jnp.float32(1e-3)
    one = jnp.float32(1.0)
    new_state, ld = step(state, batch, lr, one, one)
    loss = float(ld['optimization_loss'])
    assert np.isfinite(loss) and loss > 0
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, new_state.params)
    assert max(jax.tree.leaves(d)) > 0
