"""Single-buffer host->device batch upload (+ compact wire codecs).

The device sits behind a high-RTT tunnel (~30ms per transfer round-trip,
scripts/profile_infer.py). A batch dict holds ~50 small numpy arrays (key
pyramids, conv plans, validity masks, supervision), so a naive per-array
`jax.device_put(dict)` costs ~50 RTTs — measured 1.7s for a 5MB batch,
dwarfing the tens of ms the same bytes take as ONE array. This module packs
the batch into a single contiguous uint8 buffer on the host (one memcpy
pass), ships it in one transfer, and reconstructs every array INSIDE the
jitted consumer via static slices + bitcasts (zero-copy in XLA, no extra
dispatches).

wire='compact' additionally shrinks the buffer ~3x with LOSSLESS codecs whose
bounds are STRUCTURAL (known from the batch layout, not guessed from values):

  * bool arrays        -> bit-packed (8x)
  * vox_features       -> uint8 + a /255 LUT decode, iff the floats are
                          exactly u8/255 (true for PLY colors and the
                          synthetic generator; asserted at pack time)
  * batch0/batch_ids   -> int8   (values in [-1, B), B <= 127 by layout)
  * pooling_ids        -> uint16 (values in [0, S_pad], S_pad known from the
                          signature; applied only when S_pad < 65535)
  * up_parent{l}       -> scene-local int8 deltas ('d8p'): along each scene's
                          key-sorted window the parent position moves by tiny
                          steps (usually 0/+1; occasional bounded backward
                          jumps at coordinate-field carries — flooring is not
                          monotone across carries, DESIGN.md round-3), so
                          pos % pad_{l+1} delta-encodes to i8 with a short
                          per-row exception list (measured ~150/131072 rows
                          at ScanNet scale); decode = scatter + cumsum.
                          Sentinel rows (== the keys{l}_b SENT rows, asserted
                          at pack) are re-derived at decode. Falls back to
                          scene-local uint16 ('u16sc') / plain uint16 on
                          layouts without the window structure.
  * keys{l}_b          -> uint16 row deltas ('d16k') for the big pyramid
                          levels (pad >= 8192): rows are sorted, consecutive
                          packed-key deltas exceed u16 only at x-plane
                          carries (<= one per occupied x plane, ~300/131072
                          measured), which ride a per-row (pos, value i32)
                          exception list; decode = scatter + cumsum.

Every codec round-trips exactly; pack() asserts reconstruction on the lossy-
looking ones. Decodes are elementwise casts/gathers fused into the consumer.

Layout is fixed by the example batch's (key, shape, dtype) signature —
exactly the property the padded-bucket batching already guarantees
(datasets/batching.py) — so one packer serves every batch of a run.

    pack, unpack, nbytes = make_batch_packer(example_dev, wire='compact')
    buf_np = pack(dev_np)                       # host: one memcpy pass
    buf = jax.device_put(buf_np)                # ONE transfer
    batch = unpack(buf)                         # traced: slices + casts

Replaces per-array upload on the hot inference/training paths; the reference
has no analog (its DataLoader pins+ships torch tensors over PCIe where
per-tensor latency is negligible, models/dataloader.py:316-332)."""

from __future__ import annotations

import re

import numpy as np
import jax
import jax.numpy as jnp

_ALIGN = 128

# u8 color decode table: matches the host-side (u8 / 255.).astype(f32) path
# bit-for-bit (a plain f32 divide on device can differ by 1 ulp)
_U8_LUT = (np.arange(256, dtype=np.float64) / 255.0).astype(np.float32)


def _pick_codec(k, a, example, wire, u8_colors=True):
    """Codec for key k given the example batch. Bounds are structural."""
    if wire != 'compact':
        return 'raw'
    if a.dtype == np.bool_:
        return 'bits'
    if k == 'vox_features' and a.dtype == np.float32:
        if not u8_colors:     # augmented/continuous colors: never on u8 grid
            return 'raw'
        u8 = np.clip(np.round(a * 255.0), 0, 255).astype(np.uint8)
        if np.array_equal(_U8_LUT[u8], a):
            return 'u8x255'
        return 'raw'
    if k in ('batch0', 'batch_ids') and a.dtype.kind == 'i':
        return 'i8'
    if k == 'pooling_ids' and a.dtype.kind == 'i':
        # voxels are key-sorted and segments are spatially coherent, so the
        # voxel->segment stream moves in tiny steps (84% |d|<=1 measured at
        # ScanNet scale; 7/524288 i8 exceptions): flat i8 deltas + a (pos,
        # value) exception list, decode = scatter + cumsum. 2x smaller than
        # the former u16 codec and value-range free.
        return ('d8f', int(a.size) // 512 + 64)
    m = re.fullmatch(r'up_parent(\d+)', k)
    if m and a.dtype.kind == 'i':
        l = int(m.group(1))
        nxt = f'keys{l + 1}_b'
        if nxt in example:
            B, pad1 = np.asarray(example[nxt]).shape
            if (f'keys{l}_b' in example
                    and a.size == B * np.asarray(example[f'keys{l}_b']).shape[1]):
                # window layout: valid rows hold pos + scene*pad1; the
                # sentinel (B*pad1, exactly the fine SENT rows) is re-derived
                # from keys{l}_b at decode. Scene-local positions along the
                # key-sorted window delta-encode to i8 with a short exception
                # list (i8 doesn't cover the backward jumps at coordinate
                # carries — flooring is NOT monotone across field carries, so
                # windowed lookups cannot replace shipping this; DESIGN.md
                # round-3 pitfalls). 4x smaller than raw, and without the
                # ~150-200 ms/batch device searchsorted the derive path cost.
                pad_f = a.size // B
                return ('d8p', int(pad1), int(B), l, pad_f // 64 + 64)
            if B * pad1 < 65535:
                return 'u16'
        return 'raw'
    m = re.fullmatch(r'keys(\d+)_b', k)
    if (m and a.ndim == 2 and a.dtype.kind == 'i' and a.shape[1] >= 8192):
        # sorted SENT-padded key rows: u16 deltas + per-row exceptions
        B, pad = a.shape
        return ('d16k', int(B), int(pad), pad // 64 + 64)
    if re.fullmatch(r'kc[35du]_cnt\d+', k) and a.dtype.kind == 'i':
        # key_conv chunk counts: <= ceil(pad/window), single digits in
        # practice (asserted < 256 at pack)
        return 'u8'
    if (re.fullmatch(r'kc[35du]_base\d+', k) and a.ndim == 3
            and a.dtype.kind == 'i'):
        # key_conv window starts: monotone along the tile axis per (scene,
        # group) — consecutive tiles' windows advance by ~tile/density rows
        # (measured max 4224 at ScanNet l0) -> u16 deltas per (b, g) row
        B, T, G = a.shape
        return ('d16b', int(B), int(T), int(G), T // 64 + 8)
    return 'raw'


def _encoded_nbytes(codec, size, itemsize):
    if isinstance(codec, tuple):
        tag = codec[0]
        if tag == 'u16sc':                       # ('u16sc', pad1, B, l)
            return 2 * size
        if tag == 'd8p':                         # ('d8p', pad1, B, l, E)
            return size + 8 * codec[2] * codec[4]
        if tag == 'd16k':                        # ('d16k', B, pad, E)
            return 2 * size + 8 * codec[1] * codec[3]
        if tag == 'd8f':                         # ('d8f', E)
            return size + 8 * codec[1]
        if tag == 'd16b':                        # ('d16b', B, T, G, E)
            return 2 * size + 8 * codec[1] * codec[3] * codec[4]
        raise AssertionError(codec)
    return {'bits': (size + 7) // 8,
            'u8x255': size, 'i8': size, 'u8': size,
            'u16': 2 * size, 'i16': 2 * size}.get(codec, size * itemsize)


def _delta_exceptions(d, small_lo, small_hi, E, key):
    """Split per-row deltas into an in-range stream + (pos, value) exception
    list. d: (B, pad) int64 true deltas. Returns (d_small int64 with 0 at
    exception slots, flat_pos int32 (B*E,), values int32 (B*E,)); unused
    exception slots get pos = B*pad (out of range -> dropped by the device
    scatter)."""
    B, pad = d.shape
    exc = (d < small_lo) | (d > small_hi)
    n_exc = exc.sum(axis=1)
    assert int(n_exc.max()) <= E, (
        f'{key}: {int(n_exc.max())} delta exceptions exceed the signature '
        f'cap {E} — degenerate key distribution; rebuild the packer with '
        "wire='raw'")
    pos = np.full((B, E), B * pad, np.int32)
    val = np.zeros((B, E), np.int32)
    for b in range(B):
        idx = np.flatnonzero(exc[b])
        pos[b, :idx.size] = (b * pad + idx).astype(np.int32)
        val[b, :idx.size] = d[b, idx].astype(np.int32)
    return np.where(exc, 0, d), pos.reshape(-1), val.reshape(-1)


def _derivable_keys(example):
    """Batch arrays that are exact functions of OTHER batch arrays under the
    device-maps layout (datasets/batching.py _build_batch_small), so they
    need not ride the wire at all — unpack() recomputes them in-jit:

      * valid0        = keys0_b != SENT_KEY   (level-0 keys are 1:1 voxels)
      * batch0        = scene index where valid else -1 (window layout)
      * seg_valid     = arange(S_pad) < num_segments

    pack() VERIFIES each derivation against the array it was handed, so a
    layout drift fails loudly on the host instead of corrupting device
    results. up_parent{l} is deliberately NOT derived: the device-side
    searchsorted re-derivation measured ~150-200 ms/batch at ScanNet scale
    (7 levels of lax.while_loop binary-search rounds), dwarfing the ~0.5
    MB/scene it saved — it ships as the scene-local u16 codec instead
    (_pick_codec 'u16sc')."""
    drop = {}
    if 'keys0_b' not in example:
        return drop
    if 'valid0' in example:
        drop['valid0'] = ('valid0', 0)
    if 'batch0' in example:
        drop['batch0'] = ('batch0', 0)
    if 'seg_valid' in example and 'num_segments' in example:
        drop['seg_valid'] = ('seg_valid', 0)
    return drop


def _derive_np(name, how, dev):
    """Host (numpy) reference of the in-jit derivations — used by pack() to
    verify the dropped arrays really are redundant for THIS batch."""
    from box2mask_tpu.sparse.device_maps import SENT_KEY
    kind, l = how
    keys0 = np.asarray(dev['keys0_b'])
    B, Vs = keys0.shape
    if kind == 'valid0':
        return (keys0 != SENT_KEY).reshape(-1)
    if kind == 'batch0':
        valid = keys0 != SENT_KEY
        scene = np.broadcast_to(np.arange(B, dtype=np.int32)[:, None],
                                valid.shape)
        return np.where(valid, scene, -1).astype(np.int32).reshape(-1)
    if kind == 'seg_valid':
        s_pad = np.asarray(dev['seg_valid']).shape[0]
        return np.arange(s_pad) < int(dev['num_segments'])
    raise AssertionError(f'unknown derivation {kind}')


def make_batch_packer(example: dict, wire: str = 'raw', derive: bool = False,
                      u8_colors: bool = True):
    """Build (pack, unpack, nbytes) for dicts matching `example`'s signature.

    pack:   dict[str, np.ndarray] -> (nbytes,) np.uint8
    unpack: (nbytes,) jnp.uint8 -> dict[str, jnp.ndarray]  (traceable)
    wire:   'raw' ships every array verbatim; 'compact' applies the lossless
            codecs documented in the module docstring (~3x smaller).
    derive: additionally drop arrays that are exact functions of other batch
            arrays and recompute them inside the jit (_derivable_keys) —
            another ~1.5x on device-maps batches; pack() verifies each
            derivation on the host per batch.
    """
    # mirror jax.device_put under the default no-x64 config: 64-bit host
    # arrays are shipped as their 32-bit counterparts
    _narrow = {np.dtype(np.int64): np.dtype(np.int32),
               np.dtype(np.uint64): np.dtype(np.uint32),
               np.dtype(np.float64): np.dtype(np.float32)}
    derived = _derivable_keys(example) if derive else {}
    dspec = [(k, np.asarray(example[k]).shape,
              _narrow.get(np.asarray(example[k]).dtype,
                          np.asarray(example[k]).dtype), derived[k])
             for k in sorted(derived)]
    spec = []
    off = 0
    for k in sorted(example):
        if k in derived:
            continue
        a = np.asarray(example[k])
        dt = _narrow.get(a.dtype, a.dtype)
        codec = _pick_codec(k, np.asarray(a, dtype=dt), example, wire,
                            u8_colors=u8_colors)
        nb = _encoded_nbytes(codec, a.size, dt.itemsize)
        spec.append((k, a.shape, dt, off, nb, codec))
        off += (nb + _ALIGN - 1) // _ALIGN * _ALIGN
    total = off

    def _encode(k, a, codec, dev=None):
        flat = np.ascontiguousarray(a).reshape(-1)
        if codec == 'raw':
            return flat.view(np.uint8)
        if isinstance(codec, tuple) and codec[0] == 'd8f':
            E = codec[1]
            d = np.diff(flat.astype(np.int64), prepend=0)[None, :]
            d_small, pos, val = _delta_exceptions(d, -128, 127, E, k)
            return np.concatenate([
                d_small.astype(np.int8).reshape(-1).view(np.uint8),
                pos.view(np.uint8), val.view(np.uint8)])
        if isinstance(codec, tuple) and codec[0] == 'd16b':
            _, B, T, G, E = codec
            # deltas along the tile axis per (scene, group) row
            vt = flat.reshape(B, T, G).astype(np.int64).transpose(0, 2, 1)
            d = np.diff(vt.reshape(B * G, T), axis=1, prepend=0)
            assert (d >= 0).all(), (
                f'{k}: window bases are not monotone along tiles — plan '
                "layout drift (sparse/key_conv.py _host_bases); rebuild the "
                "packer with wire='raw'")
            d_small, pos, val = _delta_exceptions(d, 0, 65535, E, k)
            return np.concatenate([
                d_small.astype(np.uint16).reshape(-1).view(np.uint8),
                pos.view(np.uint8), val.view(np.uint8)])
        if isinstance(codec, tuple) and codec[0] == 'd16k':
            _, B, pad, E = codec
            v = flat.reshape(B, pad).astype(np.int64)
            d = np.diff(v, axis=1, prepend=0)    # d[:, 0] == v[:, 0]
            assert (d >= 0).all(), (
                f'{k}: rows are not sorted — batch layout drift '
                "(datasets/batching.py); rebuild the packer with wire='raw'")
            d_small, pos, val = _delta_exceptions(d, 0, 65535, E, k)
            return np.concatenate([
                d_small.astype(np.uint16).reshape(-1).view(np.uint8),
                pos.view(np.uint8), val.view(np.uint8)])
        if isinstance(codec, tuple) and codec[0] in ('u16sc', 'd8p'):
            pad1, B, l = codec[1], codec[2], codec[3]
            sent_rows = flat == B * pad1
            if dev is not None:                  # verify the layout invariant
                fine = np.asarray(dev[f'keys{l}_b']).reshape(-1)
                from box2mask_tpu.sparse.device_maps import SENT_KEY
                assert np.array_equal(sent_rows, fine == SENT_KEY), (
                    f'{k}: sentinel rows disagree with keys{l}_b SENT rows — '
                    'batch layout drift (datasets/batching.py); rebuild the '
                    "packer with wire='raw'")
            assert (sent_rows | ((flat >= 0) & (flat < B * pad1))).all(), (
                f'{k}: values exceed the scene-local range')
            if codec[0] == 'u16sc':
                local = flat % pad1
                assert (local < 65536).all(), (
                    f'{k}: values exceed the scene-local u16 range')
                return np.where(sent_rows, 0, local).astype(np.uint16).view(
                    np.uint8)
            E = codec[4]
            pad_f = flat.size // B
            u = (flat.astype(np.int64) % pad1).reshape(B, pad_f)
            sent2 = sent_rows.reshape(B, pad_f)
            # the SENT padding is a contiguous row tail (keys are sorted,
            # SENT_KEY is the maximum); carry the last valid value forward so
            # the tail delta-encodes to zeros (tail values are overwritten
            # from keys{l}_b at decode anyway)
            n_valid = (~sent2).sum(axis=1)
            assert np.array_equal(sent2,
                                  np.arange(pad_f)[None, :] >= n_valid[:, None]), (
                f'{k}: SENT rows are not a contiguous row tail — rebuild the '
                "packer with wire='raw'")
            for b in range(B):
                u[b, n_valid[b]:] = u[b, n_valid[b] - 1] if n_valid[b] else 0
            d = np.diff(u, axis=1, prepend=0)    # d[:, 0] == u[:, 0]
            d_small, pos, val = _delta_exceptions(d, -128, 127, E, k)
            return np.concatenate([
                d_small.astype(np.int8).reshape(-1).view(np.uint8),
                pos.view(np.uint8), val.view(np.uint8)])
        if codec == 'bits':
            return np.packbits(flat, bitorder='little')
        if codec == 'u8x255':
            u8 = np.clip(np.round(flat * 255.0), 0, 255).astype(np.uint8)
            assert np.array_equal(_U8_LUT[u8], flat), (
                f'{k}: floats are not exactly u8/255 — rebuild the packer '
                "with wire='raw' (augmented/continuous colors)")
            return u8
        small = {'i8': np.int8, 'u8': np.uint8, 'u16': np.uint16,
                 'i16': np.int16}[codec]
        enc = flat.astype(small)
        assert np.array_equal(enc.astype(flat.dtype), flat), (
            f'{k}: values exceed the {codec} wire range — structural bound '
            'violated, file a bug (hostload._pick_codec)')
        return enc.view(np.uint8)

    def pack(dev):
        buf = np.zeros(total, np.uint8)
        for k, shape, dtype, o, nb, codec in spec:
            a = np.asarray(dev[k], dtype=dtype)
            assert a.shape == tuple(shape), \
                f'{k}: shape {a.shape} != packer signature {shape}'
            buf[o:o + nb] = _encode(k, a, codec, dev=dev)
        for k, shape, dtype, how in dspec:
            got = np.asarray(_derive_np(k, how, dev), dtype=dtype)
            want = np.asarray(dev[k], dtype=dtype).reshape(got.shape)
            assert np.array_equal(got, want), (
                f'{k}: host derivation mismatches the batch array — layout '
                'drift between datasets/batching.py and hostload._derive_np; '
                "rebuild the packer with derive=False")
        return buf

    def _decode(raw, shape, dtype, codec):
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if isinstance(codec, tuple) and codec[0] == 'd8f':
            E = codec[1]
            d = jax.lax.bitcast_convert_type(
                raw[:size], jnp.int8).reshape(-1).astype(jnp.int32)
            pos = jax.lax.bitcast_convert_type(
                raw[size:size + 4 * E].reshape(-1, 4), jnp.int32).reshape(-1)
            val = jax.lax.bitcast_convert_type(
                raw[size + 4 * E:].reshape(-1, 4), jnp.int32).reshape(-1)
            d = d.at[pos].set(val, mode='drop')
            return jnp.cumsum(d, dtype=jnp.int32).astype(
                jnp.dtype(dtype)).reshape(shape)
        if isinstance(codec, tuple) and codec[0] == 'd16b':
            _, B, T, G, E = codec
            nd = 2 * size
            d = jax.lax.bitcast_convert_type(
                raw[:nd].reshape(-1, 2), jnp.uint16).reshape(-1).astype(
                jnp.int32)
            pos = jax.lax.bitcast_convert_type(
                raw[nd:nd + 4 * B * G * E].reshape(-1, 4),
                jnp.int32).reshape(-1)
            val = jax.lax.bitcast_convert_type(
                raw[nd + 4 * B * G * E:].reshape(-1, 4),
                jnp.int32).reshape(-1)
            d = d.at[pos].set(val, mode='drop')
            vt = jnp.cumsum(d.reshape(B * G, T), axis=1, dtype=jnp.int32)
            return vt.reshape(B, G, T).transpose(0, 2, 1).astype(
                jnp.dtype(dtype)).reshape(shape)
        if isinstance(codec, tuple) and codec[0] == 'd16k':
            _, B, pad, E = codec
            nd = 2 * size
            d = jax.lax.bitcast_convert_type(
                raw[:nd].reshape(-1, 2), jnp.uint16).reshape(-1).astype(
                jnp.int32)
            pos = jax.lax.bitcast_convert_type(
                raw[nd:nd + 4 * B * E].reshape(-1, 4), jnp.int32).reshape(-1)
            val = jax.lax.bitcast_convert_type(
                raw[nd + 4 * B * E:].reshape(-1, 4), jnp.int32).reshape(-1)
            d = d.at[pos].set(val, mode='drop')
            return jnp.cumsum(d.reshape(B, pad), axis=1,
                              dtype=jnp.int32).reshape(shape)
        if isinstance(codec, tuple) and codec[0] == 'd8p':
            _, pad1, B, l, E = codec
            pad_f = size // B
            d = jax.lax.bitcast_convert_type(
                raw[:size], jnp.int8).reshape(-1).astype(jnp.int32)
            pos = jax.lax.bitcast_convert_type(
                raw[size:size + 4 * B * E].reshape(-1, 4),
                jnp.int32).reshape(-1)
            val = jax.lax.bitcast_convert_type(
                raw[size + 4 * B * E:].reshape(-1, 4), jnp.int32).reshape(-1)
            d = d.at[pos].set(val, mode='drop')
            local = jnp.cumsum(d.reshape(B, pad_f), axis=1, dtype=jnp.int32)
            # sentinel rows re-derived from keys{l}_b in the unpack post-pass
            return (local
                    + jnp.arange(B, dtype=jnp.int32)[:, None] * pad1
                    ).reshape(shape)
        if isinstance(codec, tuple):             # ('u16sc', pad1, B, l)
            _, pad1, B, l = codec
            u16 = jax.lax.bitcast_convert_type(raw.reshape(-1, 2), jnp.uint16)
            scene = jnp.arange(size, dtype=jnp.int32) // (size // B)
            # sentinel rows re-derived from keys{l}_b in the unpack post-pass
            return (u16.reshape(-1).astype(jnp.int32)
                    + scene * pad1).reshape(shape)
        if codec == 'bits':
            bits = jnp.right_shift(raw[:, None],
                                   jnp.arange(8, dtype=jnp.uint8)[None, :])
            return (bits & 1).reshape(-1)[:size].astype(bool).reshape(shape)
        if codec == 'u8x255':
            return jnp.asarray(_U8_LUT)[raw.astype(jnp.int32)].reshape(shape)
        if codec in ('i8', 'u8', 'u16', 'i16'):
            small = {'i8': jnp.int8, 'u8': jnp.uint8, 'u16': jnp.uint16,
                     'i16': jnp.int16}[codec]
            if small == jnp.uint8:
                arr = raw
            elif small == jnp.int8:
                arr = jax.lax.bitcast_convert_type(raw, small)
            else:
                arr = jax.lax.bitcast_convert_type(raw.reshape(-1, 2), small)
            return arr.astype(jnp.dtype(dtype)).reshape(shape)
        it = dtype.itemsize
        if dtype == np.bool_:
            return (raw != 0).reshape(shape)
        if it == 1:
            arr = raw if dtype == np.uint8 else raw.astype(jnp.dtype(dtype))
            return arr.reshape(shape)
        return jax.lax.bitcast_convert_type(
            raw.reshape(-1, it), jnp.dtype(dtype)).reshape(shape)

    def unpack(buf):
        out = {}
        for k, shape, dtype, o, nb, codec in spec:
            raw = jax.lax.slice(buf, (o,), (o + nb,))
            out[k] = _decode(raw, shape, dtype, codec)
        from box2mask_tpu.sparse.device_maps import SENT_KEY as _SENT
        for k, shape, dtype, o, nb, codec in spec:
            if isinstance(codec, tuple) and codec[0] in ('u16sc', 'd8p'):
                pad1, B, l = codec[1], codec[2], codec[3]   # sentinel re-derive
                fine = out[f'keys{l}_b'].reshape(-1)
                out[k] = jnp.where(fine == _SENT, B * pad1,
                                   out[k].reshape(-1)).reshape(shape)
        if dspec:
            from box2mask_tpu.sparse.device_maps import SENT_KEY
            keys0 = out['keys0_b']
            B = keys0.shape[0]
            valid2d = keys0 != SENT_KEY
            for k, shape, dtype, (kind, l) in dspec:
                if kind == 'valid0':
                    v = valid2d.reshape(-1)
                elif kind == 'batch0':
                    scene = jnp.broadcast_to(
                        jnp.arange(B, dtype=jnp.int32)[:, None], valid2d.shape)
                    v = jnp.where(valid2d, scene, -1).reshape(-1)
                elif kind == 'seg_valid':
                    v = (jnp.arange(shape[0]) <
                         out['num_segments'].astype(jnp.int32))
                else:
                    raise AssertionError(f'unknown derivation {kind}')
                out[k] = v.astype(jnp.dtype(dtype)).reshape(shape)
        return out

    return pack, unpack, total


class BatchUploader:
    """Drop-in replacement for ``{k: jnp.asarray(v) for ...}`` batch uploads.

    Over the tunnel, a per-array upload of a ~50-array batch dict costs ~50
    round-trips (~1.7 s measured); this uploads ONE packed buffer and runs a
    tiny jitted unpack ON DEVICE, so the batch dict materializes in HBM with
    one transfer + one dispatch and feeds any existing jitted consumer
    (train step, eval forward) unchanged.

    Packers are cached per batch signature (shapes vary across bucket sizes).
    Augmented color features silently fall back off the u8 codec; any other
    pack-time verification failure falls back to raw non-derived packing for
    that signature — correctness never depends on the fast path.

    On non-TPU backends (tests, CPU dev) upload() just device_puts the dict:
    packing is pure overhead when there is no wire."""

    def __init__(self, wire='compact', derive=True, enable=None):
        self.wire, self.derive = wire, derive
        if enable is None:
            enable = jax.default_backend() == 'tpu'
        self.enable = enable
        self._cache = {}

    def _signature(self, dev):
        return tuple(sorted((k, np.asarray(v).shape, str(np.asarray(v).dtype))
                            for k, v in dev.items()))

    def _build(self, dev, u8_colors, derive, wire):
        pack, unpack, _ = make_batch_packer(dev, wire=wire, derive=derive,
                                            u8_colors=u8_colors)
        return pack, jax.jit(unpack)

    def __call__(self, dev):
        if not self.enable:
            return {k: jnp.asarray(v) for k, v in dev.items()}
        buf, unpack = self.put(dev)
        return unpack(buf)

    def put(self, dev):
        """Stage 1 of a SPLIT upload: pack on host + ONE device_put of the
        packed buffer; returns (device_buf, unpack_fn). Callers that are
        memory-tight at the step's peak (bs=8 no-remat training,
        bench.bench_train's middle ladder rung) overlap only THIS ~MB-scale
        transfer with device compute and dispatch `unpack_fn(device_buf)` —
        which materializes the full ~35 MB decoded batch — only after the
        in-flight step completes. __call__ composes put+unpack for everyone
        else."""
        assert self.enable
        sig = self._signature(dev)
        entry = self._cache.get(sig)
        if entry is None:
            entry = self._cache[sig] = [
                self._build(dev, True, self.derive, self.wire),
                True, self.derive, self.wire]
        while True:
            (pack, unpack), u8_colors, derive, wire = entry
            try:
                buf = pack(dev)
            except AssertionError:
                if u8_colors:          # augmented colors left the u8 grid
                    entry = self._cache[sig] = [
                        self._build(dev, False, derive, wire), False,
                        derive, wire]
                    continue
                if derive:             # derivation verify failed: ship all
                    entry = self._cache[sig] = [
                        self._build(dev, False, False, wire), False, False,
                        wire]
                    continue
                if wire != 'raw':      # codec cap/layout assert: ship raw
                    # (e.g. a dense small scene whose key-delta exception
                    # count exceeds the signature cap — measured on the
                    # quality gate's 2cm overfit scene)
                    entry = self._cache[sig] = [
                        self._build(dev, False, False, 'raw'), False, False,
                        'raw']
                    continue
                raise
            return jax.device_put(buf), unpack
