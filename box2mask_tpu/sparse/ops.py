"""Device-side sparse-voxel ops: gather-GEMM convolutions, transpose convs, masked
batch norm, segment pooling.

TPU replacement for MinkowskiEngine's CUDA kernels (reference call sites:
models/detection_net.py:37-230,345-352). All ops take static-shape padded arrays from
sparse/coords.py; the convention is:

  * features x: (V_pad, C); rows >= num_valid are padding,
  * neighbor maps nbr: (Vout_pad, K) int32 with value == Vin_pad meaning "missing" —
    each op appends a single zero feature row at index Vin_pad, so missing neighbors
    contribute nothing without masks in the inner loop,
  * matmuls run on the MXU in `compute_dtype` (bfloat16 by default) and accumulate in
    float32 (`preferred_element_type`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _zpad(x):
    """Append one zero row (the 'missing neighbor' target)."""
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)


def gather_conv(x, nbr, w, compute_dtype=jnp.bfloat16, unroll_threshold=9,
                use_pallas=False):
    """Sparse convolution: out[v] = sum_k x[nbr[v, k]] @ w[k].

    x:   (Vin_pad, Cin)
    nbr: (Vout_pad, K) int32, Vin_pad == missing
    w:   (K, Cin, Cout)
    returns (Vout_pad, Cout) float32

    With use_pallas=True (and tile-aligned shapes) dispatches to the fused
    window-gather MXU kernel (sparse/pallas_conv.py).
    """
    if isinstance(nbr, dict) and 'spatial_kc' in nbr:
        # spatially-sharded key_conv operand (parallel/spatial.py
        # _emit_spatial_kc_plans): halo exchange, compact the [H|pad|H] slot
        # layout into the shard's contiguous sorted ext rows, then run the
        # in-window key-matching kernel. Same-level convs compute outputs
        # over the WHOLE ext space (input space == output space, so
        # key_conv_train's plan-reusing mirrored backward applies verbatim)
        # and slice the local rows; the stride-2 down conv outputs the local
        # coarse rows directly, with its transpose structure (par/widx over
        # ext fine rows) shipped for the backward.
        from box2mask_tpu.parallel import spatial
        from box2mask_tpu.sparse import key_conv as KC
        ksize, stride_child, scale = nbr['spatial_kc']
        ext = spatial.halo_extend(x, nbr['slab_left'], nbr['slab_right'],
                                  nbr['halo'], axis=nbr.get('axis',
                                                            spatial.AXIS))
        xe = jnp.take(ext, nbr['ext_map'], axis=0)
        keys = nbr['ext_keys']                      # (ext_pad,) sorted
        ext_pad = keys.shape[0]
        bases, counts = nbr['bases'], nbr['counts']
        win = min(KC.WINDOW, ext_pad)
        if stride_child:
            okeys = nbr['keys_out']
            tile = okeys.shape[0] // bases.shape[0]
            return KC.key_conv_down_train(
                xe, keys[None], okeys.reshape(-1, 1), bases[None],
                counts[None], nbr['up_parent'], nbr['up_widx'], w,
                scale, win, tile)
        tile = ext_pad // bases.shape[0]
        out = KC.key_conv_train(xe, keys[None], keys.reshape(-1, 1),
                                bases[None], counts[None], w, ksize, scale,
                                True, win, tile)
        return jax.lax.dynamic_slice(
            out, (nbr['ext_lo'][0], 0), (nbr['pad'], out.shape[1]))
    if isinstance(nbr, dict) and 'slab_left' in nbr:
        # spatially-sharded operand (parallel/spatial.py): exchange boundary
        # rows with the mesh neighbors (one ppermute hop each way), then
        # gather-GEMM over the extended [halo|local|halo] row space.
        from box2mask_tpu.parallel import spatial
        ext = spatial.halo_extend(x, nbr['slab_left'], nbr['slab_right'],
                                  nbr['halo'], axis=nbr.get('axis',
                                                            spatial.AXIS))
        return gather_conv(ext, nbr['nmap'], w, compute_dtype=compute_dtype,
                           unroll_threshold=unroll_threshold,
                           use_pallas=use_pallas)
    if isinstance(nbr, dict):
        # key_conv window-plan operand (sparse/key_conv.py): the conv matches
        # packed keys in-window inside the kernel — no neighbor map exists.
        # The *_train wrappers carry exact custom VJPs, so the same path
        # serves inference and training.
        from box2mask_tpu.sparse import key_conv as KC
        ksize, stride_child, scale = nbr['static']
        if stride_child:
            if 'bases_u' in nbr:
                # kernel backward over the up plans (no einsum+gather)
                return KC.key_conv_down_plan_train(
                    x, nbr['keys_in'], nbr['keys_out_col'], nbr['bases'],
                    nbr['counts'], nbr['bases_u'], nbr['counts_u'], w,
                    scale, KC.WINDOW)
            return KC.key_conv_down_train(
                x, nbr['keys_in'], nbr['keys_out_col'], nbr['bases'],
                nbr['counts'], nbr['up_parent'], nbr['up_widx'], w,
                scale, KC.WINDOW)
        win = KC.WINDOW_STEM if ksize == 5 else KC.WINDOW
        if (ksize == 5 and scale == 1 and x.shape[1] <= 8
                and os.environ.get('B2M_STEM_GATHER', '1') == '1'):
            # stem fast path: search+gather kernel (~125x fewer issued MXU
            # flops than the one-hot match at cin=3; key_conv._stem_kernel).
            # Same plans/wire; dx is zeros (the stem input is data).
            # B2M_STEM_GATHER=0 A/Bs the one-hot path.
            return KC.key_conv_stem_train(
                x, nbr['keys_in'], nbr['bases'], nbr['counts'], w, win)
        return KC.key_conv_train(
            x, nbr['keys_in'], nbr['keys_out_col'], nbr['bases'],
            nbr['counts'], w, ksize, scale, True, win)
    K = w.shape[0]
    if use_pallas:
        from box2mask_tpu.sparse import pallas_conv as PC
        if nbr.shape[0] % PC.TILE == 0:
            return PC.sparse_conv(x, nbr, w)
    xz = _zpad(x.astype(compute_dtype))
    wc = w.astype(compute_dtype)
    if K <= unroll_threshold:
        out = jnp.zeros((nbr.shape[0], w.shape[2]), jnp.float32)
        for k in range(K):
            out = out + jnp.dot(jnp.take(xz, nbr[:, k], axis=0), wc[k],
                                preferred_element_type=jnp.float32)
        return out

    def body(acc, inp):
        idx, wk = inp
        acc = acc + jnp.dot(jnp.take(xz, idx, axis=0), wk,
                            preferred_element_type=jnp.float32)
        return acc, None

    init = jnp.zeros((nbr.shape[0], w.shape[2]), jnp.float32)
    out, _ = jax.lax.scan(body, init, (nbr.T, wc))
    return out


def up_conv(x_coarse, parent, widx, w, compute_dtype=jnp.bfloat16,
            use_pallas=False, kc=None):
    """Stride-2 transpose ("generative up") convolution from level l+1 to level l.

    Every fine output voxel has exactly one coarse parent and one of 8 weight slots
    (sparse/coords.py up_parent/up_widx). We compute all 8 candidate outputs per
    coarse voxel with one batched einsum (U*8*Cin*Cout FLOPs ~= Vfine*Cin*Cout, 8x
    cheaper than masked matmuls) and gather the right row per fine voxel.

    x_coarse: (U_pad, Cin); parent: (Vfine_pad,) int32 with U_pad == missing;
    widx: (Vfine_pad,) int32 in [0, 8); w: (8, Cin, Cout).

    `kc`: key_conv up operand (batches carrying 'kcu_base{l}' window plans) —
    dispatches to the stride_parent pallas kernel with exact custom VJPs
    (sparse/key_conv.key_conv_up_train): the einsum materializes a U*8*Cout
    f32 intermediate and row-gathers V rows from it, which is
    gather-bandwidth bound (~20 ms at ScanNet level 1->0 vs ~2 ms windowed).
    """
    if kc is not None:
        from box2mask_tpu.sparse import key_conv as KC
        return KC.key_conv_up_train(
            x_coarse, kc['keys_in'], kc['keys_out_col'], kc['bases'],
            kc['counts'], kc['keys_fine'], kc['keys_coarse_col'],
            kc['bases_d'], kc['counts_d'], w, kc['scale'], KC.WINDOW_UP)
    U = x_coarse.shape[0]
    cout = w.shape[2]
    y = jnp.einsum('uc,kcd->ukd', x_coarse.astype(compute_dtype),
                   w.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    y = y.reshape(U * 8, cout)
    idx = jnp.where(parent >= U, U * 8, parent * 8 + widx)
    if use_pallas:
        from box2mask_tpu.sparse import pallas_conv as PC
        if idx.shape[0] % PC.TILE == 0:
            # idx is monotone (children sorted within each parent block)
            return PC.gather_rows(y, idx)
    y = jnp.concatenate([y, jnp.zeros((1, cout), y.dtype)], axis=0)
    return jnp.take(y, idx, axis=0)


def linear(x, w, b=None, compute_dtype=jnp.bfloat16):
    """1x1 sparse conv == dense per-voxel linear layer (head MLPs,
    reference detection_net.py:170-194)."""
    out = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out


def masked_moments(x, valid, n_valid, axis_name=None):
    """Mean/variance over valid rows only (padding excluded exactly —
    MinkowskiBatchNorm averages over active voxels). With `axis_name`, sums are
    psum'd across the mesh axis => SyncBatchNorm semantics
    (reference models/model.py:25)."""
    m = valid.astype(jnp.float32)[:, None]
    s1 = jnp.sum(x.astype(jnp.float32) * m, axis=0)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)) * m, axis=0)
    n = n_valid.astype(jnp.float32)
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        n = jax.lax.psum(n, axis_name)
    n = jnp.maximum(n, 1.0)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return mean, var, n


def segment_sum(x, seg_ids, num_segments):
    """segment_sum with an extra trash segment: ids == num_segments are dropped."""
    s = jax.ops.segment_sum(x, seg_ids, num_segments=num_segments + 1)
    return s[:num_segments]


def segment_mean(x, seg_ids, num_segments):
    # f32 accumulation regardless of activation dtype: a segment can sum
    # thousands of rows, far past bf16's 8-bit mantissa (--bf16_acts)
    s = segment_sum(x.astype(jnp.float32), seg_ids, num_segments)
    cnt = segment_sum(jnp.ones((x.shape[0], 1), jnp.float32), seg_ids, num_segments)
    return s / jnp.maximum(cnt, 1.0), cnt[:, 0]


def segment_max(x, seg_ids, num_segments):
    s = jax.ops.segment_max(x.astype(jnp.float32), seg_ids,
                            num_segments=num_segments + 1)
    s = jnp.where(jnp.isfinite(s), s, 0.0)
    return s[:num_segments]


def segment_pool(x, pooling_ids, num_segments, mode='avg'):
    """Per-oversegment pooling of voxel features.

    Replaces the reference's batch-column rewrite + MinkowskiGlobalAvg/MaxPooling
    trick (models/detection_net.py:345-352). `pooling_ids` must map padded voxels to
    `num_segments` (the trash row)."""
    if mode == 'avg':
        pooled, _ = segment_mean(x, pooling_ids, num_segments)
        return pooled
    elif mode == 'max':
        return segment_max(x, pooling_ids, num_segments)
    raise ValueError(mode)
