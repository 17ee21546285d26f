"""Single-buffer batch upload (engine/hostload.py): pack/unpack roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.engine.hostload import make_batch_packer


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    dev = {
        'vox_features': rng.normal(size=(64, 6)).astype(np.float32),
        'keys0_b': rng.integers(0, 1 << 30, size=(2, 32)).astype(np.int32),
        'valid0': rng.integers(0, 2, size=64).astype(bool),
        'num0': np.int32(57),
        'flags': rng.integers(0, 255, size=(5,)).astype(np.uint8),
        'ids64': rng.integers(0, 1 << 30, size=(7,)).astype(np.int64),
    }
    pack, unpack, nbytes = make_batch_packer(dev)
    buf = pack(dev)
    assert buf.dtype == np.uint8 and buf.shape == (nbytes,)
    out = jax.jit(unpack)(jnp.asarray(buf))
    assert set(out) == set(dev)
    for k in dev:
        a = np.asarray(out[k])
        # device_put parity: 64-bit host arrays ship as 32-bit (no-x64 mode)
        want = jax.device_get(jax.device_put(dev[k]))
        assert a.dtype == want.dtype, k
        np.testing.assert_array_equal(a, want, err_msg=k)


def test_compact_wire_roundtrip():
    """Compact codecs (bits/u8x255/i8/u16) must reconstruct EXACTLY."""
    rng = np.random.default_rng(1)
    V, S = 256, 64
    colors = rng.integers(0, 256, size=(V, 3)).astype(np.float64) / 255.0
    dev = {
        'vox_features': colors.astype(np.float32),
        'valid0': rng.integers(0, 2, size=V).astype(bool),
        'seg_valid': rng.integers(0, 2, size=S).astype(bool),
        'batch0': rng.integers(-1, 2, size=V).astype(np.int32),
        'batch_ids': rng.integers(-1, 2, size=S).astype(np.int32),
        'pooling_ids': rng.integers(0, S + 1, size=V).astype(np.int32),
        'keys1_b': rng.integers(0, 1 << 30, size=(1, 128)).astype(np.int32),
        'up_parent0': rng.integers(0, 128, size=V).astype(np.int32),
        'num0': np.int32(200),
    }
    pack, unpack, nbytes = make_batch_packer(dev, wire='compact')
    raw_nbytes = make_batch_packer(dev, wire='raw')[2]
    assert nbytes < raw_nbytes * 0.7, (nbytes, raw_nbytes)
    out = jax.jit(unpack)(jnp.asarray(pack(dev)))
    for k in dev:
        a = np.asarray(out[k])
        want = jax.device_get(jax.device_put(dev[k]))
        assert a.dtype == want.dtype, k
        np.testing.assert_array_equal(a, want, err_msg=k)


def test_compact_wire_rejects_non_u8_colors():
    dev = {'vox_features': np.full((8, 3), 0.123456, np.float32)}
    pack, _, _ = make_batch_packer(dev, wire='compact')
    # 0.123456 is off the u8 grid -> codec must have fallen back to raw
    out_dev = {'vox_features': np.full((8, 3), 0.654321, np.float32)}
    buf = pack(out_dev)          # raw codec: any floats pack fine
    assert buf.nbytes >= 8 * 3 * 4


def test_pack_rejects_shape_drift():
    dev = {'a': np.zeros((4, 4), np.float32)}
    pack, _, _ = make_batch_packer(dev)
    bad = {'a': np.zeros((4, 5), np.float32)}
    try:
        pack(bad)
        assert False, 'expected shape-signature assert'
    except AssertionError as e:
        assert 'signature' in str(e)


def test_derive_mode_matches_full_batch():
    """derive=True drops up_parent/batch0/valid0/seg_valid from the wire and
    recomputes them in-jit; on a REAL device-maps batch the reconstruction
    must equal the originals bit-for-bit (pack also self-verifies on host)."""
    from box2mask_tpu.config import get_config
    from box2mask_tpu.datasets import synthetic
    from box2mask_tpu.datasets.voxelize import voxelize_scene
    from box2mask_tpu.datasets.batching import build_batch
    from box2mask_tpu.datasets.tables import get_tables

    cfg = get_config([
        '--dataset_name', 'synthetic',
        '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
        'mlp_semantics',
        '--do_segment_pooling', '--bb_supervision', '--smallest_bb_heuristic',
        '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
        '--loss_weight_semantics', '1', '--voxel_size', '0.05',
        '--vox_bucket', '128', '--seg_bucket', '16', '--key_conv_force',
        '--exp_name', 'hostload_derive'])
    _, sem_id2idx, _, _ = get_tables('scannet')
    rets = []
    for s in (3, 4):
        scene, labels = synthetic.make_scene(seed=s, num_instances=3,
                                             points_per_instance=120,
                                             floor_points=500,
                                             wall_points=300)
        ret = voxelize_scene(scene, cfg)
        ret['labels'] = labels
        rets.append(ret)
    dev, _ = build_batch(rets, cfg, sem_id2idx, mode='val')
    assert 'up_parent0' not in dev and 'kc3_base0' in dev

    pack_d, unpack_d, n_derive = make_batch_packer(dev, wire='compact',
                                                   derive=True)
    n_full = make_batch_packer(dev, wire='compact')[2]
    assert n_derive < n_full          # the wire actually shrank
    out = jax.jit(unpack_d)(jnp.asarray(pack_d(dev)))
    assert set(out) == set(dev)
    for k in dev:
        want = jax.device_get(jax.device_put(dev[k]))
        got = np.asarray(out[k])
        assert got.dtype == want.dtype, k
        np.testing.assert_array_equal(got, want, err_msg=k)


def test_delta_codecs_roundtrip_with_exceptions():
    """d16k (sorted key rows) and d8p (scene-local parent positions) must
    reconstruct exactly THROUGH their exception paths: key deltas beyond u16
    (x-plane carries) and parent jumps beyond i8 (field-carry backtracks)."""
    from box2mask_tpu.sparse.device_maps import SENT_KEY
    rng = np.random.default_rng(3)
    B, pad, pad1 = 2, 8192, 4096
    keys = np.zeros((B, pad), np.int64)
    ups = np.zeros((B, pad), np.int64)
    for b in range(B):
        n = 6000 + b * 500
        # deltas mostly tiny, sprinkled with >u16 jumps (x-carries)
        d = rng.integers(1, 5, size=n)
        d[rng.choice(n, size=40, replace=False)] = rng.integers(
            1 << 17, 1 << 20, size=40)
        v = np.cumsum(d)
        assert v[-1] < SENT_KEY
        keys[b, :n] = v
        keys[b, n:] = SENT_KEY
        # parent positions: non-decreasing steps of 0/1 with occasional
        # backward jumps beyond i8 (carry backtracks), all within [0, pad1)
        p = np.cumsum(rng.integers(0, 2, size=n)) % (pad1 // 2)
        p[rng.choice(n, size=30, replace=False)] = rng.integers(
            0, pad1, size=30)
        ups[b, :n] = p + b * pad1
        ups[b, n:] = B * pad1
    dev = {'keys0_b': keys.astype(np.int32),
           'keys1_b': np.concatenate(
               [np.sort(rng.choice(1 << 20, size=100, replace=False)),
                np.full(pad1 - 100, SENT_KEY)]).astype(np.int32)[None, :].repeat(
               B, axis=0),
           'up_parent0': ups.reshape(-1).astype(np.int32)}
    pack, unpack, nbytes = make_batch_packer(dev, wire='compact')
    raw_nbytes = make_batch_packer(dev, wire='raw')[2]
    assert nbytes < raw_nbytes * 0.55, (nbytes, raw_nbytes)
    out = jax.jit(unpack)(jnp.asarray(pack(dev)))
    for k in dev:
        np.testing.assert_array_equal(
            np.asarray(out[k]), jax.device_get(jax.device_put(dev[k])),
            err_msg=k)


def test_delta_codec_cap_overflow_is_loud():
    """A batch whose key-delta exception count exceeds the signature cap must
    fail the pack() assert (BatchUploader then falls back to raw)."""
    from box2mask_tpu.sparse.device_maps import SENT_KEY
    B, pad = 1, 8192
    # every delta is an x-carry-scale jump -> way past the pad//64+64 cap
    v = np.cumsum(np.full(pad, 1 << 16, np.int64))
    assert v[-1] < SENT_KEY
    dev = {'keys0_b': v.astype(np.int32)[None, :]}
    pack, _, _ = make_batch_packer(dev, wire='compact')
    try:
        pack(dev)
        assert False, 'expected exception-cap assert'
    except AssertionError as e:
        assert 'exceptions exceed' in str(e)


def test_batch_uploader_fallbacks():
    """BatchUploader: exact results on (1) a pristine device-maps batch,
    (2) augmented colors off the u8 grid (u8x255 fallback), (3) a batch
    whose derivable array was tampered with (derivation-verify fallback to
    shipping everything) — correctness never depends on the fast path."""
    from box2mask_tpu.engine.hostload import BatchUploader

    rng = np.random.default_rng(2)
    V = 64
    base = {
        'keys0_b': np.sort(rng.choice(1 << 20, size=40, replace=False)
                           ).astype(np.int32),
        'vox_features': (rng.integers(0, 256, size=(V, 3)) / 255.0
                         ).astype(np.float32),
        'num0': np.int32(40),
    }
    base['keys0_b'] = np.concatenate(
        [base['keys0_b'], np.full(V - 40, 1 << 30, np.int32)])[None, :]
    base['valid0'] = (base['keys0_b'] != (1 << 30)).reshape(-1)
    base['batch0'] = np.where(base['valid0'], 0, -1).astype(np.int32)

    up = BatchUploader(enable=True)     # force the packed path on CPU

    def check(dev):
        out = up(dev)
        for k in dev:
            want = jax.device_get(jax.device_put(dev[k]))
            np.testing.assert_array_equal(np.asarray(out[k]), want,
                                          err_msg=k)

    check(base)                                       # pristine: derive path
    aug = dict(base)
    aug['vox_features'] = base['vox_features'] + np.float32(1e-4)  # off-grid
    check(aug)                                        # u8x255 fallback
    bad = dict(base)
    bad['batch0'] = base['batch0'].copy()
    bad['batch0'][0] = 7                              # derivation now false
    check(bad)                                        # ship-everything path


def test_plan_and_pooling_codecs_roundtrip():
    """d8f (voxel->segment stream), u8 (key_conv chunk counts) and d16b
    (window bases, monotone along tiles per group) must reconstruct exactly,
    including d8f jumps beyond i8 and d16b jumps beyond u16."""
    rng = np.random.default_rng(5)
    V, B, T, G = 4096, 2, 64, 3
    # segment stream: mostly 0/+1 steps with a few arbitrary jumps
    pool = np.cumsum(rng.integers(0, 2, size=V)) % 500
    pool[rng.choice(V, size=17, replace=False)] = rng.integers(
        0, 60000, size=17)
    # bases: per (scene, group) monotone along tiles, a few >u16 jumps
    d = rng.integers(0, 1000, size=(B, T, G)).astype(np.int64)
    d[:, 17, :] = 1 << 18
    bases = np.cumsum(d, axis=1).astype(np.int32)
    cnts = rng.integers(0, 23, size=(B, T, G)).astype(np.int32)
    dev = {
        'pooling_ids': pool.astype(np.int32),
        'seg_valid': np.ones(1000, bool),
        'kc3_base0': bases,
        'kc3_cnt0': cnts,
    }
    pack, unpack, nbytes = make_batch_packer(dev, wire='compact')
    raw_nbytes = make_batch_packer(dev, wire='raw')[2]
    assert nbytes < raw_nbytes * 0.5, (nbytes, raw_nbytes)
    out = jax.jit(unpack)(jnp.asarray(pack(dev)))
    for k in dev:
        a = np.asarray(out[k])
        want = jax.device_get(jax.device_put(dev[k]))
        assert a.dtype == want.dtype, k
        np.testing.assert_array_equal(a, want, err_msg=k)


def test_uploader_falls_back_to_raw_on_codec_cap():
    """A batch whose key-delta exception count exceeds the signature cap
    must NOT crash the uploader: the fallback chain ends at wire='raw'
    (regression: the 2cm quality-gate scene hit 419 exceptions vs cap 224
    and the old chain only disabled `derive`, round 4)."""
    from box2mask_tpu.engine.hostload import BatchUploader
    rng = np.random.default_rng(7)
    pad = 8192                           # d16k applies at pad >= 8192
    # every consecutive delta blows past u16 -> exceptions >> cap
    keys = (np.arange(pad, dtype=np.int64) * (1 << 18)).astype(np.int32)
    dev = {'keys0_b': keys[None], 'num_segments': np.int32(10),
           'vox_features': rng.random((pad, 3)).astype(np.float32)}
    up = BatchUploader(enable=True)
    out = up(dev)
    for k in dev:
        np.testing.assert_array_equal(
            np.asarray(out[k]), jax.device_get(jax.device_put(dev[k])),
            err_msg=k)
