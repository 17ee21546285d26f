"""Pallas TPU kernel: sparse convolution by in-window packed-key matching.

Replaces BOTH halves of the round-1 hot path — the searchsorted neighbor-map
build (sparse/device_maps.py) AND the XLA row-gather conv (sparse/ops.py
gather_conv) — with one fused kernel. It rests on two structural facts about
our batches (reference analog: MinkowskiEngine's kernel maps built on the
coordinate hash, models/detection_net.py:37-230):

  1. voxels are sorted by packed key (x,y,z bit-packed, datasets/batching.py
     host_level_keys), so for every kernel offset the neighbor of output row
     r+1 sits at an input row >= that of row r (monotone maps), and a tile of
     T consecutive output rows reads one contiguous input window per offset;
  2. the neighbor relation itself is key arithmetic: levels store floored
     ORIGINAL-scale coords, so the level-l (dx,dy,dz) neighbor of key k is
     k + 2^l*(dx<<2A | dy<<A | dz), and the stride-2 down conv's fine-level
     child keys of coarse key k are k + 2^l*(dx<<2A | dy<<A | dz) with
     dx,dy,dz in {0,1}.

So per (output tile, dx-group) the kernel DMAs a window of input features and
input keys, builds each offset's gather one-hot ON THE FLY as an integer
compare ``win_keys == tile_keys + delta`` (T x W), and runs gather + weight as
two MXU matmuls. No neighbor maps exist anywhere: device memory traffic is
the feature window (sequential DMA at HBM bandwidth) and the per-tile window
start positions (built from host searchsorted over ~tiles queries — a few KB).

Missing neighbors produce all-zero one-hot rows (contribute nothing); axis
boundary wraps (coordinate 0-1 or 1023+1 borrowing across bit fields) are
masked exactly from the unpacked key fields; SENT-padded rows never match
(their query is forced to -1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from box2mask_tpu.sparse.device_maps import AXIS_BITS, AXIS_MAX, SENT_KEY

# measured-best on v5e at 118k voxels/96ch (scripts/ab_key_conv.py sweep):
# 128/384 = 3.2ms/conv vs 4.3 at 256/512 and 8.3 for the XLA gather path
TILE = 128          # output rows per grid step (overridable per call)
WINDOW = 384        # input rows per window chunk (multiple of 128)
# the one-hot gather matmul costs T*W*cin_pad per offset REGARDLESS of how
# few lanes carry real channels, so narrow-input convs want the smallest
# window whose BLOCKING spill chunks stay rare. Windows must be multiples
# of 128 (Mosaic lane-slice alignment). Measured same-session interleaved
# A/B at ScanNet 2cm (round 4): stem W=384 12.0 ms vs W=256 15.9 (30% of
# (tile,group) windows spill to blocking chunks) vs W=128 14.2 — the
# narrower window LOSES to chunk stalls, so the stem stays at 384. The up
# transpose keeps 128: <= T/2 parents per tile, spills ~0%.
WINDOW_STEM = 384
WINDOW_UP = 128


def _round128(c):
    return ((c + 127) // 128) * 128


def offsets_3d(kernel_size, stride_child=False):
    """(K, 3) int offsets in the reference's kernel-offset order
    (sparse/coords.py _offsets): x-major, matching the weight slot layout."""
    if stride_child:
        rng = (0, 1)
    else:
        h = kernel_size // 2
        rng = range(-h, h + 1)
    return np.array([(dx, dy, dz) for dx in rng for dy in rng for dz in rng],
                    np.int32)


def pack_delta(off, scale=1):
    """Packed-key delta of a (dx,dy,dz) offset at level `scale = 2**l`.
    Levels store floored ORIGINAL-scale coords (host_level_keys), so both the
    same-level conv at level l (offsets +-2**l per field) and the stride-2
    down conv (child = coarse + {0,1}*2**l per field) are key additions.

    ARITHMETIC sum, not bitwise OR: negative field deltas are borrows
    (two's-complement OR of negatives would collapse them, e.g.
    (-1<<20)|(-1<<10)|-1 == -1)."""
    dx, dy, dz = (int(v) * scale for v in off)
    return dx * (1 << (2 * AXIS_BITS)) + dy * (1 << AXIS_BITS) + dz


def group_by_dx(offs):
    """Group offset rows by dx (shared input window per group)."""
    order = {}
    for i, (dx, dy, dz) in enumerate(offs):
        order.setdefault(int(dx), []).append(i)
    return [order[dx] for dx in sorted(order)]


def group_offsets(offs, mode='dx'):
    """Offset grouping -> shared input window per group.

    'dx':   3 groups for 3^3 (window spans the full +-1 y-range, ~350 rows
            at ScanNet l0 density -> WINDOW 384).
    'dxdy': 9 groups for 3^3; within a group only dz varies, so the window
            span is the tile's own key span +-scale (~130 rows -> WINDOW 256).
            More window DMAs, but every one-hot compare and gather matmul
            shrinks by W: total VPU+MXU work drops ~1/3.
    """
    if mode == 'dx':
        return group_by_dx(offs)
    assert mode == 'dxdy', mode
    order = {}
    for i, (dx, dy, dz) in enumerate(offs):
        order.setdefault((int(dx), int(dy)), []).append(i)
    return [order[k] for k in sorted(order)]


def _kernel(bases_ref, counts_ref, keys_col_ref, w_ref, x_hbm, keys_hbm,
            out_ref, win_x, win_k, sem_x, sem_k, *,
            groups, deltas, offs, cin, cout, window, pad, tiles,
            scale, guard, tile):
    b = pl.program_id(0)
    t = pl.program_id(1)
    flat = b * tiles + t
    total = pl.num_programs(0) * tiles
    keys_col = keys_col_ref[:, :]                       # (T, 1) int32

    if guard:
        xf = jax.lax.shift_right_logical(keys_col, 2 * AXIS_BITS)
        yf = jax.lax.shift_right_logical(keys_col, AXIS_BITS) & (AXIS_MAX - 1)
        zf = keys_col & (AXIS_MAX - 1)
    valid_row = keys_col < SENT_KEY                     # (T, 1)

    G = len(groups)

    def dma_pair(flat_idx, g, chunk, slot):
        # logical chunk [su, su+window); DMA start clamped inside the scene's
        # padded block, overlap deduped by the column mask in compute().
        # keys arrive as a single (1, B*pad) row: only the (128-aligned) lane
        # dimension is sliced — a size-1 sublane slice of a (B, pad) array
        # trips Mosaic's (4,128) int32 tiling for B > 1.
        su = bases_ref[flat_idx * G + g] + chunk * window
        start = pl.multiple_of(jnp.minimum(su, pad - window), 128)
        bq = flat_idx // tiles
        cpx = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bq * pad + start, window), :],
            win_x.at[g, slot], sem_x.at[g, slot])
        cpk = pltpu.make_async_copy(
            keys_hbm.at[pl.ds(0, 1), pl.ds(bq * pad + start, window)],
            win_k.at[g, slot], sem_k.at[g, slot])
        return su - start, cpx, cpk

    def issue(flat_idx, slot):
        # chunk-0 window DMAs for every non-empty group of tile flat_idx
        for g in range(G):
            _, cpx, cpk = dma_pair(flat_idx, g, 0, slot)

            @pl.when(counts_ref[flat_idx * G + g] > 0)
            def _(cpx=cpx, cpk=cpk):
                cpx.start()
                cpk.start()

    # cross-tile double buffering: tile flat's chunk-0 windows were issued
    # into slot flat%2 by the PREVIOUS grid step (grid steps run in order on
    # the core), so their DMA latency overlaps that step's compute; this step
    # issues tile flat+1 into the other slot before computing. The kernel is
    # DMA-latency bound (DESIGN.md round-3: (dx,dy)-grouping negative
    # result), so hiding the window fetch is worth the 2x VMEM.
    # count == 0 (query range holds no input keys — SENT padding tiles and
    # boundary groups, 50-75% of tiles at levels 2+) skips the group's DMA
    # and matmuls entirely: the start is pl.when-guarded and the wait+compute
    # sits in the matching lax.cond, so semaphores stay balanced.
    slot = flat % 2

    @pl.when(flat == 0)
    def _first():
        issue(flat, slot)

    @pl.when(flat + 1 < total)
    def _next():
        issue(flat + 1, 1 - slot)

    def compute(g, shift, slot, acc):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
        wk = jnp.where(cols >= shift, win_k[g, slot, :, :], -2)    # (1, W)
        wx = win_x[g, slot, :, :]                                  # (W, Cin)
        for k in groups[g]:                                  # static unroll
            q = keys_col + deltas[k]
            ok = valid_row
            if guard:
                dx, dy, dz = (v * scale for v in offs[k])
                if dx != 0:
                    ok = ok & ((xf + dx >= 0) & (xf + dx < AXIS_MAX))
                if dy != 0:
                    ok = ok & ((yf + dy >= 0) & (yf + dy < AXIS_MAX))
                if dz != 0:
                    ok = ok & ((zf + dz >= 0) & (zf + dz < AXIS_MAX))
            # q >= 0 guard: unguarded stride_parent queries go NEGATIVE at
            # scene boundaries (q = fine_key - delta) and must never hit the
            # -2 masked-lane sentinel above — real window keys are all >= 0,
            # so -1 matches nothing (advisor round 4)
            qm = jnp.where(ok & (q >= 0), q, -1)                        # (T, 1)
            oh = jnp.where(wk == qm, jnp.float32(1),
                           jnp.float32(0)).astype(jnp.bfloat16)
            gath = jnp.dot(oh, wx, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(gath.astype(jnp.bfloat16), w_ref[k],
                                preferred_element_type=jnp.float32)
        return acc

    acc = jnp.zeros((tile, cout), jnp.float32)
    for g in range(G):
        cnt = counts_ref[flat * G + g]
        shift0, cpx, cpk = dma_pair(flat, g, 0, slot)

        def do_group(acc, g=g, shift0=shift0, cpx=cpx, cpk=cpk):
            cpk.wait()
            cpx.wait()
            acc = compute(g, shift0, slot, acc)

            # overflow chunks (rare wide-span tiles, ~4% at l0) run blocking
            # in the CURRENT slot — the next tile's prefetch lives in the
            # other slot, so no clobber
            def chunk_body(c, acc, g=g):
                shift, cpx2, cpk2 = dma_pair(flat, g, c, slot)
                cpx2.start()
                cpk2.start()
                cpk2.wait()
                cpx2.wait()
                return compute(g, shift, slot, acc)

            return jax.lax.fori_loop(1, cnt, chunk_body, acc)

        acc = jax.lax.cond(cnt > 0, do_group, lambda a: a, acc)
    # accumulation stays f32; the HBM store narrows to the output dtype
    # (bf16 under --bf16_acts, via the input-dtype rule in key_conv)
    out_ref[:] = acc.astype(out_ref.dtype)


def _host_bases(keys_np, out_keys_np, deltas, groups, window, pad,
                tile=TILE):
    """Per (tile, group) window start + chunk count from host searchsorted
    over one query per tile per offset (~tiles*K queries, microseconds).

    count == 0 marks a (tile, group) whose query key range contains NO input
    keys (incl. all-SENT padding tiles, whose queries sit past every real
    key): the kernel skips the window DMA and all of the group's matmuls —
    at ScanNet scale 50-75% of the tiles at levels 2+ are padding
    (tests/test_key_conv.py covers the empty-group path).

    keys_np: (pad,) sorted int32 input keys (SENT-padded);
    out_keys_np: (pad_out,) sorted int32 output keys."""
    n_in = int(np.searchsorted(keys_np, SENT_KEY))
    tiles = len(out_keys_np) // tile
    firsts = out_keys_np[::tile][:tiles].astype(np.int64)
    G = len(groups)
    bases = np.zeros((tiles, G), np.int32)
    counts = np.zeros((tiles, G), np.int32)
    # per-offset positions of each tile's first query (+ sentinel tile at end)
    pos = np.empty((len(deltas), tiles + 1), np.int64)
    for k, d in enumerate(deltas):
        pos[k, :tiles] = np.searchsorted(keys_np[:n_in], firsts + d)
        pos[k, tiles] = n_in
    for g, members in enumerate(groups):
        lo_raw = pos[members, :tiles].min(axis=0)
        hi = pos[members, 1:].max(axis=0)
        lo = np.minimum(lo_raw & ~np.int64(127), max(0, pad - window))
        span = np.maximum(hi - lo, 1)
        bases[:, g] = lo
        counts[:, g] = np.where(hi <= lo_raw, 0, -(-span // window))
    return bases, counts




@functools.partial(
    jax.jit,
    static_argnames=('kernel_size', 'stride_child', 'stride_parent', 'scale',
                     'guard', 'window', 'tile', 'group_mode', 'interpret'))
def key_conv(x, keys_in_b, keys_out_col, bases, counts, w, *,
             kernel_size=3, stride_child=False, stride_parent=False, scale=1,
             guard=True, window=WINDOW, tile=TILE, group_mode='dx',
             interpret=False):
    """out[v] = sum_k x[match(key_out[v] + delta_k * scale)] @ w[k].

    x:            (B*pad_in, Cin) features, scene-interleaved, key-sorted
    keys_in_b:    (B, pad_in) int32 sorted keys (SENT-padded)
    keys_out_col: (B*pad_out, 1) int32 output keys (== input keys for
                  same-level convs; coarse keys for the down conv; FINE keys
                  for the stride_parent transpose conv)
    bases/counts: (B, tiles, G) int32 window starts / chunk counts
    w:            (K, Cin, Cout)

    stride_parent: the TRANSPOSE ("generative up") conv as a key match:
    fine-row query k is `fine_key - child_delta_k`, which equals the parent's
    floored key iff the fine row's per-field level bits equal offset k (its
    up_widx) — and can equal NO other coarse key: subtracting 2^l from a
    field whose bit l is 0 always leaves bit l set in that field (borrows
    into higher fields never clear it), and every coarse key has bit l clear
    in every field. So exactly one offset matches per fine row, with the
    parent's features and the widx weight slot — ops.up_conv semantics, but
    windowed at HBM bandwidth instead of the giant einsum+row-gather."""
    Bp_in, cin_raw = x.shape
    B, pad = keys_in_b.shape
    n_out = keys_out_col.shape[0]
    pad_out = n_out // B
    assert pad_out % tile == 0, f'pad_out {pad_out} % {tile}'
    window = min(window, pad)
    offs = offsets_3d(kernel_size, stride_child=stride_child or stride_parent)
    sign = -1 if stride_parent else 1
    deltas = [sign * pack_delta(o, scale) for o in offs]
    groups = group_offsets(offs, group_mode)
    kdim = len(offs)
    assert w.shape[0] == kdim
    tiles = pad_out // tile
    G = len(groups)

    cin, cout = _round128(cin_raw), _round128(w.shape[2])
    # output dtype follows the INPUT dtype (a bf16 x is the --bf16_acts
    # activation policy asking for bf16 out): no extra static arg, jit
    # specializes on dtype, and the f32 path keeps exact parity with the
    # oracle. Under bf16 this removes the (n_out, cout) f32 transient —
    # ~512 MB at bs=8 level 0 — that an external astype would create at the
    # peak-memory point of the no-remat training step.
    out_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xp = jnp.zeros((Bp_in, cin), jnp.bfloat16)
    xp = xp.at[:, :cin_raw].set(x.astype(jnp.bfloat16))
    wp = jnp.zeros((kdim, cin, cout), jnp.bfloat16)
    wp = wp.at[:, :cin_raw, :w.shape[2]].set(w.astype(jnp.bfloat16))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda b, t, *_: (b * tiles + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # weights
            pl.BlockSpec(memory_space=pl.ANY),          # x in HBM
            pl.BlockSpec(memory_space=pl.ANY),          # keys in HBM
        ],
        out_specs=pl.BlockSpec(
            (tile, cout), lambda b, t, *_: (b * tiles + t, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G, 2, window, cin), jnp.bfloat16),
            pltpu.VMEM((G, 2, 1, window), jnp.int32),
            pltpu.SemaphoreType.DMA((G, 2)),
            pltpu.SemaphoreType.DMA((G, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, deltas=deltas,
                          offs=[tuple(int(v) for v in o) for o in offs],
                          cin=cin, cout=cout, window=window, pad=pad,
                          tiles=tiles, scale=scale, guard=guard, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, cout), out_dtype),
        interpret=interpret,
    )(bases.reshape(-1), counts.reshape(-1), keys_out_col, wp, xp,
      keys_in_b.reshape(1, -1))
    return out[:, :w.shape[2]]


# ------------------------------------------------------------ stem fast path
def _stem_im2col(bases_ref, counts_ref, keys_row_ref, x_hbm, keys_hbm,
                 im2_ref, win_x, win_k, sem_x, sem_k, *,
                 cin, window, pad, tiles, tile, rows_pc, R):
    """Shared search+gather im2col builder for the 5^3 stem kernels.

    The one-hot formulation burns T*W*128 MXU flops PER OFFSET regardless of
    how few lanes carry real channels — at cin=3 that is 42x padding waste
    x125 offsets, ~50 ms of the ~210 ms 4-scene batch wall (round-4
    profile_levels), and its dw twin pays the same again on the training
    backward. This builder replaces all 125 padded matmuls with VPU work
    that scales with what is actually gathered:

      per (tile, dx-group): ONE vectorized binary search per dy-column over
      the window's sorted keys (queries qb = key + delta(dx, dy, -2), five
      dy's in parallel on the 8 sublanes), then 5 probe rows lo..lo+4 —
      the dz in [-2,2] neighbors of a column are CONTIGUOUS among existing
      keys, so the first five keys >= qb cover every possible hit — with
      Mosaic lane-gathers (tpu dynamic_gather: lane dim only, exactly 128
      lanes per source) pulling the matched rows' features straight into a
      per-tile im2col^T scratch. The forward finishes with one dense
      (R x T)^T @ (R x Cout) matmul; the dw kernel with im2col @ g.

    Mosaic constraint that shaped the layout: dynamic_gather sources must
    sit at LANE OFFSET 0 (slicing lanes 128:256 of a loaded (1,384) value
    crashes the compiler — probed round 5), so windows arrive CHUNKED on a
    leading dim: keys as (nch, 128) rows of the key plane, features as
    (nch, 8, 128) rows of the channel-major plane (see _stem_operands) —
    one DMA each, chunk selection is leading-dim indexing.

    im2col^T row layout (must match the weight scatter in key_conv_stem and
    the row gather in key_conv_stem_dw):
      row(c, g, m, dy) = c*rows_pc + g*40 + m*8 + (dy+2)
    (dy slots padded 5->8 so every store is a native-aligned (8,128) f32
    block; the 3 junk sublanes and the R tail carry zero weights).

    Chunked windows: probes clamp to the window end and compare BY VALUE, so
    a row found in two overlapping chunks merges idempotently (same value) —
    unlike the accumulating one-hot kernel, no shift masking is needed. The
    unguarded tail of the binary search may overshoot past-the-end queries
    by one (lo = W+1); harmless for the same reason.

    Replaces the reference's conv0 MinkowskiConvolution(kernel 5)
    (models/detection_net.py:37,234-337) at the stem site only."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    flat = b * tiles + t
    total = pl.num_programs(0) * tiles
    G = 5
    nch = window // 128
    iters = int(np.ceil(np.log2(window))) if window > 1 else 1

    qk = jnp.broadcast_to(keys_row_ref[...], (8, tile))      # (8, T) int32
    valid = qk < SENT_KEY
    xf = jax.lax.shift_right_logical(qk, 2 * AXIS_BITS)
    yf = jax.lax.shift_right_logical(qk, AXIS_BITS) & (AXIS_MAX - 1)
    zf = qk & (AXIS_MAX - 1)
    dy_s = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 0) - 2
    yq = yf + dy_s
    ok_dy = (yq >= 0) & (yq < AXIS_MAX) & (dy_s <= 2)    # junk sublanes off
    okz = []
    for m in range(5):
        zq = zf + (m - 2)
        okz.append((zq >= 0) & (zq < AXIS_MAX))

    def dma_pair(flat_idx, g, chunk, slot):
        su = bases_ref[flat_idx * G + g] + chunk * window
        # bases and window are 128-aligned (see _host_bases), so the clamped
        # start maps exactly onto chunk rows of the reshaped planes
        start = jnp.minimum(su, pad - window)
        bq = flat_idx // tiles
        row0 = jax.lax.shift_right_logical(bq * pad + start, 7)
        cpx = pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0, nch)], win_x.at[g, slot], sem_x.at[g, slot])
        cpk = pltpu.make_async_copy(
            keys_hbm.at[pl.ds(row0, nch)], win_k.at[g, slot],
            sem_k.at[g, slot])
        return cpx, cpk

    def issue(flat_idx, slot):
        for g in range(G):
            cpx, cpk = dma_pair(flat_idx, g, 0, slot)

            @pl.when(counts_ref[flat_idx * G + g] > 0)
            def _(cpx=cpx, cpk=cpk):
                cpx.start()
                cpk.start()

    # cross-tile double buffering (see _kernel): this tile's chunk-0 windows
    # were prefetched into slot flat%2 by the previous grid step
    slot = flat % 2

    @pl.when(flat == 0)
    def _first():
        issue(flat, slot)

    @pl.when(flat + 1 < total)
    def _next():
        issue(flat + 1, 1 - slot)

    if R > cin * rows_pc:
        @pl.when(flat == 0)
        def _zero_tail():
            # rows >= cin*rows_pc are never stored; their weights are zero
            # but the scratch must not hold NaNs (0 * NaN = NaN)
            im2_ref[cin * rows_pc:, :] = jnp.zeros(
                (R - cin * rows_pc, tile), jnp.float32)

    def compute(g, slot, vals):
        """Search + probe + gather this (group, chunk) window into vals."""
        dx = g - 2
        dK = dx * (1 << (2 * AXIS_BITS))
        xq = xf + dx
        ok_g = valid & ok_dy & (xq >= 0) & (xq < AXIS_MAX)
        qb = qk + dK + dy_s * AXIS_MAX - 2          # column base (z-2) query
        wkc = [jnp.broadcast_to(win_k[g, slot, j:j + 1, :], (8, tile))
               for j in range(nch)]
        wxc = [[jnp.broadcast_to(win_x[g, slot, j, c:c + 1, :], (8, tile))
                for j in range(nch)] for c in range(cin)]

        def gat_prep(pos):
            # chunk-local indices + chunk selectors, shared by every source
            # gathered at the same positions (1 key + cin feature planes)
            ljs = [jnp.clip(pos - 128 * j, 0, 127) for j in range(nch)]
            sels = [pos >= 128 * j for j in range(1, nch)]
            return ljs, sels

        def gat(srcs, prep):
            ljs, sels = prep
            out = jnp.take_along_axis(srcs[0], ljs[0], axis=1)
            for j in range(1, nch):
                out = jnp.where(sels[j - 1],
                                jnp.take_along_axis(srcs[j], ljs[j], axis=1),
                                out)
            return out

        lo = jnp.zeros((8, tile), jnp.int32)
        hi = jnp.full((8, tile), window, jnp.int32)
        for _ in range(iters):
            mid = (lo + hi) >> 1
            pred = gat(wkc, gat_prep(mid)) < qb
            lo = jnp.where(pred, mid + 1, lo)
            hi = jnp.where(pred, hi, mid)
        for j in range(5):
            prep = gat_prep(jnp.minimum(lo + j, window - 1))
            kj = gat(wkc, prep)
            fj = [gat(wxc[c], prep) for c in range(cin)]
            for m in range(5):
                hit = ok_g & okz[m] & (kj == qb + m)
                for c in range(cin):
                    vals[m * cin + c] = jnp.where(hit, fj[c],
                                                  vals[m * cin + c])
        return vals

    for g in range(G):
        cnt = counts_ref[flat * G + g]
        cpx, cpk = dma_pair(flat, g, 0, slot)
        zero = [jnp.zeros((8, tile), jnp.float32) for _ in range(5 * cin)]

        def do_group(vals, g=g, cpx=cpx, cpk=cpk):
            cpk.wait()
            cpx.wait()
            vals = compute(g, slot, vals)

            def chunk_body(c, vals, g=g):
                cpx2, cpk2 = dma_pair(flat, g, c, slot)
                cpx2.start()
                cpk2.start()
                cpk2.wait()
                cpx2.wait()
                return tuple(compute(g, slot, list(vals)))

            return list(jax.lax.fori_loop(1, cnt, chunk_body, tuple(vals)))

        vals = jax.lax.cond(cnt > 0, do_group, lambda v: v, zero)
        for m in range(5):
            for c in range(cin):
                r0 = c * rows_pc + g * 40 + m * 8
                im2_ref[r0:r0 + 8, :] = vals[m * cin + c]


def _stem_kernel(bases_ref, counts_ref, keys_row_ref, w_ref, x_hbm, keys_hbm,
                 out_ref, im2_ref, win_x, win_k, sem_x, sem_k, *,
                 cin, window, pad, tiles, tile, rows_pc, R):
    """Search+gather 5^3 stem FORWARD: im2col^T then one dense matmul per
    tile (~125x fewer issued MXU flops than the one-hot kernel at cin=3).
    See _stem_im2col for the method and layout."""
    _stem_im2col(bases_ref, counts_ref, keys_row_ref, x_hbm, keys_hbm,
                 im2_ref, win_x, win_k, sem_x, sem_k, cin=cin, window=window,
                 pad=pad, tiles=tiles, tile=tile, rows_pc=rows_pc, R=R)
    out_ref[...] = jax.lax.dot_general(
        im2_ref[...].astype(jnp.bfloat16), w_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _stem_dw_kernel(bases_ref, counts_ref, keys_row_ref, g_ref, x_hbm,
                    keys_hbm, dw_ref, im2_ref, win_x, win_k, sem_x, sem_k, *,
                    cin, window, pad, tiles, tile, rows_pc, R):
    """Search+gather 5^3 stem WEIGHT GRADIENT: dw_rows += im2col^T @ g,
    accumulated over the grid (the one-hot dw kernel pays the same 42x
    padding waste as the one-hot forward — this is its cheap twin on the
    training path). Junk rows (dy pad slots, R tail) accumulate zeros or
    garbage x finite g; key_conv_stem_dw gathers only the real rows."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _stem_im2col(bases_ref, counts_ref, keys_row_ref, x_hbm, keys_hbm,
                 im2_ref, win_x, win_k, sem_x, sem_k, cin=cin, window=window,
                 pad=pad, tiles=tiles, tile=tile, rows_pc=rows_pc, R=R)
    dw_ref[...] += jnp.dot(im2_ref[...].astype(jnp.bfloat16),
                           g_ref[...].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)


def _stem_operands(x, keys_in_b, window, tile):
    """Chunk-major operand planes for the stem kernels (see _stem_im2col):
    keys as (B*pad/128, 128) rows, features as (B*pad/128, 8, 128) with
    channels on the middle dim — window DMAs slice chunk ROWS, so every
    gather source lives at lane offset 0."""
    Bp, cin_raw = x.shape
    B, pad = keys_in_b.shape
    assert Bp == B * pad and pad % tile == 0 and cin_raw <= 8
    window = min(window, pad)
    assert window % 128 == 0 and pad % 128 == 0
    keys2d = keys_in_b.reshape(-1, 128)
    xt = jnp.zeros((Bp, 8), jnp.float32)
    xt = xt.at[:, :cin_raw].set(x.astype(jnp.float32))
    xt3 = jnp.transpose(xt.reshape(Bp // 128, 128, 8), (0, 2, 1))
    rows_pc = 200                     # 5 dx-groups x (5 dz x 8 dy slots)
    R = _round128(cin_raw * rows_pc)
    return keys2d, xt3, window, rows_pc, R, B, pad, cin_raw


def _stem_rows(cin_raw, rows_pc):
    """im2col^T row index of (channel c, offset k) in the x-major offset
    enumeration — the weight scatter/gather permutation."""
    offs = offsets_3d(5)
    return np.array([c * rows_pc + (dx + 2) * 40 + (dz + 2) * 8 + (dy + 2)
                     for c in range(cin_raw) for (dx, dy, dz) in offs])


def _stem_grid_spec(B, pad, tile, window, cin_raw, R, out_block, out_index):
    G = 5
    nch = window // 128
    tiles = pad // tile
    op_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if out_block[0] is None
               else pl.BlockSpec(out_block[0], out_block[1],
                                 memory_space=pltpu.VMEM))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec((1, tile), lambda b, t, *_: (0, b * tiles + t),
                         memory_space=pltpu.VMEM),    # query keys as lanes
            op_spec,                                  # wm / g operand
            pl.BlockSpec(memory_space=pl.ANY),        # xt3 in HBM
            pl.BlockSpec(memory_space=pl.ANY),        # keys2d in HBM
        ],
        out_specs=pl.BlockSpec(out_index[0], out_index[1],
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, tile), jnp.float32),            # im2col^T
            pltpu.VMEM((G, 2, nch, 8, 128), jnp.float32),  # feature windows
            pltpu.VMEM((G, 2, nch, 128), jnp.int32),       # key windows
            pltpu.SemaphoreType.DMA((G, 2)),
            pltpu.SemaphoreType.DMA((G, 2)),
        ],
    )


@functools.partial(jax.jit, static_argnames=('window', 'tile', 'interpret'))
def key_conv_stem(x, keys_in_b, bases, counts, w, *, window=WINDOW_STEM,
                  tile=TILE, interpret=False):
    """5^3 same-level conv for tiny cin (the network stem) via the
    search+gather kernel (_stem_kernel). Same plans, same wire, same
    semantics as key_conv(kernel_size=5) — ~125x fewer issued MXU flops.

    x:          (B*pad, cin) features, cin <= 8
    keys_in_b:  (B, pad) sorted int32 keys (SENT-padded); output space ==
                input space (stride-1 stem)
    bases/counts: the kc5 window plans (host_conv_plans)
    w:          (125, cin, cout)
    """
    (keys2d, xt3, window, rows_pc, R, B, pad,
     cin_raw) = _stem_operands(x, keys_in_b, window, tile)
    tiles = pad // tile
    offs = offsets_3d(5)
    assert w.shape[0] == len(offs)
    cout_raw = w.shape[2]
    cout = _round128(cout_raw)
    # weight rows scattered to the im2col^T layout
    rows = _stem_rows(cin_raw, rows_pc)
    wsrc = jnp.transpose(w.astype(jnp.bfloat16), (1, 0, 2)).reshape(
        cin_raw * len(offs), cout_raw)
    wm = jnp.zeros((R, cout), jnp.bfloat16).at[rows, :cout_raw].set(wsrc)

    grid_spec = _stem_grid_spec(
        B, pad, tile, window, cin_raw, R,
        out_block=(None, None),
        out_index=((tile, cout), lambda b, t, *_: (b * tiles + t, 0)))
    out = pl.pallas_call(
        functools.partial(_stem_kernel, cin=cin_raw, window=window, pad=pad,
                          tiles=tiles, tile=tile, rows_pc=rows_pc, R=R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * pad, cout), jnp.float32),
        interpret=interpret,
    )(bases.reshape(-1), counts.reshape(-1), keys_in_b.reshape(1, -1), wm,
      xt3, keys2d)
    return out[:, :cout_raw]


@functools.partial(jax.jit, static_argnames=('window', 'tile', 'interpret'))
def key_conv_stem_dw(x, g, keys_in_b, bases, counts, *, window=WINDOW_STEM,
                     tile=TILE, interpret=False):
    """Stem weight gradient via the search+gather im2col:
    dw[k, c, o] = sum_v im2col[v, (c,k)] * g[v, o] — one (R,T)@(T,Cout)
    accumulating matmul per tile instead of 125 padded one-hot matmuls
    (key_conv_dw at cin=3 pays the forward's 42x waste AGAIN)."""
    (keys2d, xt3, window, rows_pc, R, B, pad,
     cin_raw) = _stem_operands(x, keys_in_b, window, tile)
    tiles = pad // tile
    cout_raw = g.shape[1]
    cout = _round128(cout_raw)
    # bf16 pad: _stem_dw_kernel consumes g as bf16 either way; see
    # key_conv_dw's gp note
    gp = jnp.zeros((B * pad, cout), jnp.bfloat16)
    gp = gp.at[:, :cout_raw].set(g.astype(jnp.bfloat16))

    grid_spec = _stem_grid_spec(
        B, pad, tile, window, cin_raw, R,
        out_block=((tile, cout), lambda b, t, *_: (b * tiles + t, 0)),
        out_index=((R, cout), lambda b, t, *_: (0, 0)))
    dwr = pl.pallas_call(
        functools.partial(_stem_dw_kernel, cin=cin_raw, window=window,
                          pad=pad, tiles=tiles, tile=tile, rows_pc=rows_pc,
                          R=R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, cout), jnp.float32),
        interpret=interpret,
    )(bases.reshape(-1), counts.reshape(-1), keys_in_b.reshape(1, -1), gp,
      xt3, keys2d)
    rows = _stem_rows(cin_raw, rows_pc)
    dw = dwr[rows, :cout_raw].reshape(cin_raw, 125, cout_raw)
    return jnp.transpose(dw, (1, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def key_conv_stem_train(x, keys_in_b, bases, counts, w, window=WINDOW_STEM,
                        tile=TILE):
    """Differentiable stem conv: forward = the search+gather kernel; dw =
    the search+gather dw kernel over the same windows. dx is NOT computed —
    the stem is the network's first op and its input is data
    (batch['vox_features']); the returned x-cotangent is zeros.
    ops.gather_conv routes only the stem site here."""
    return key_conv_stem(x, keys_in_b, bases, counts, w,
                         window=window, tile=tile,
                         interpret=jax.default_backend() != 'tpu')


def _kcs_fwd(x, keys_in_b, bases, counts, w, window, tile):
    out = key_conv_stem_train(x, keys_in_b, bases, counts, w, window, tile)
    return out, (x.astype(jnp.bfloat16), x[:1, :1], keys_in_b, bases, counts,
                 w)


def _kcs_bwd(window, tile, res, gout):
    x_bf, x_marker, keys_in_b, bases, counts, w = res
    interp = jax.default_backend() != 'tpu'
    dw = key_conv_stem_dw(x_bf, gout, keys_in_b, bases, counts,
                          window=window, tile=tile, interpret=interp)
    dx = jnp.zeros((x_bf.shape[0], x_bf.shape[1]), x_marker.dtype)
    return (dx, None, None, None, dw.astype(w.dtype))


key_conv_stem_train.defvjp(_kcs_fwd, _kcs_bwd)


def key_conv_reference(x, keys_in_b, keys_out_b, w, kernel_size=3,
                       stride_child=False, scale=1):
    """NumPy oracle: searchsorted matching, exact missing/boundary handling."""
    B, pad = keys_in_b.shape
    pad_out = keys_out_b.shape[1]
    offs = offsets_3d(kernel_size, stride_child=stride_child)
    out = np.zeros((B, pad_out, w.shape[2]), np.float32)
    xs = np.asarray(x).reshape(B, pad, -1)
    for b in range(B):
        keys = np.asarray(keys_in_b[b]).astype(np.int64)
        n_in = int(np.searchsorted(keys, SENT_KEY))
        ko = np.asarray(keys_out_b[b]).astype(np.int64)
        valid = ko < SENT_KEY
        kq = np.where(valid, ko, 0)
        xf = kq >> (2 * AXIS_BITS)
        yf = (kq >> AXIS_BITS) & (AXIS_MAX - 1)
        zf = kq & (AXIS_MAX - 1)
        for k, (dx, dy, dz) in enumerate(offs):
            q = kq + pack_delta((dx, dy, dz), scale)
            sx, sy, sz = dx * scale, dy * scale, dz * scale
            ok = (valid & (xf + sx >= 0) & (xf + sx < AXIS_MAX)
                  & (yf + sy >= 0) & (yf + sy < AXIS_MAX)
                  & (zf + sz >= 0) & (zf + sz < AXIS_MAX))
            pos = np.searchsorted(keys[:n_in], q)
            hit = ok & (pos < n_in) & (keys[np.minimum(pos, n_in - 1)] == q)
            src = np.where(hit, pos, 0)
            contrib = xs[b][src].astype(np.float32) @ np.asarray(
                w[k], np.float32)
            out[b] += np.where(hit[:, None], contrib, 0.0)
    return out.reshape(B * pad_out, w.shape[2])


def host_conv_plans(keys_levels, vox_bucket=4096, stem_kernel=5):
    """Per-scene window plans for every conv site of the network, computed in
    the loader's prefetch threads. Returns dict of (bases, counts) arrays.

    keys_levels: list of 8 SENT-padded sorted key arrays (one per level,
    padded to the batch's common level pads)."""
    plans = {}
    offs3 = offsets_3d(3)
    g3 = group_by_dx(offs3)
    offs5 = offsets_3d(stem_kernel)
    g5 = group_by_dx(offs5)
    offsd = offsets_3d(2, stride_child=True)
    gd = group_by_dx(offsd)
    for l, keys in enumerate(keys_levels):
        scale = 1 << l
        pad = len(keys)
        win = min(WINDOW, pad)
        d3 = [pack_delta(o, scale) for o in offs3]
        plans[f'kc3_base{l}'], plans[f'kc3_cnt{l}'] = _host_bases(
            keys, keys, d3, g3, win, pad)
        if l == 0:
            d5 = [pack_delta(o) for o in offs5]
            plans[f'kc5_base{l}'], plans[f'kc5_cnt{l}'] = _host_bases(
                keys, keys, d5, g5, min(WINDOW_STEM, pad), pad)
        if l + 1 < len(keys_levels):
            coarse = keys_levels[l + 1]
            dd = [pack_delta(o, scale) for o in offsd]
            plans[f'kcd_base{l}'], plans[f'kcd_cnt{l}'] = _host_bases(
                keys, coarse, dd, gd, win, pad)
            # transpose ("up") conv l+1 -> l: fine queries into the COARSE
            # key array with negated child deltas (key_conv stride_parent)
            du = [-d for d in dd]
            win_u = min(WINDOW_UP, len(coarse))
            plans[f'kcu_base{l}'], plans[f'kcu_cnt{l}'] = _host_bases(
                coarse, keys, du, gd, win_u, len(coarse))
    return plans


# --------------------------------------------------------------- training path
def _dw_kernel(bases_ref, counts_ref, keys_col_ref, g_ref, x_hbm, keys_hbm,
               dw_ref, win_x, win_k, sem_x, sem_k, *,
               groups, deltas, offs, cin, cout, window, pad, tiles,
               scale, guard, tile):
    """dw[k] += (onehot_k @ win_x)^T @ g_tile, accumulated over the grid
    (same windows as the forward; the output block revisits every step).
    Cross-tile double buffering mirrors _kernel: tile flat's chunk-0 windows
    were prefetched into slot flat%2 by the previous grid step.

    Sites whose (K, cin, cout) f32 output block would bust the 16 MB
    scoped-VMEM limit next to the 2-slot windows (27x512x256 dec blocks =
    16.48 MB total, measured compile failure round 4) never reach this
    kernel whole: key_conv_dw splits them per dx-group below."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    flat = b * tiles + t
    total = pl.num_programs(0) * tiles

    @pl.when((b == 0) & (t == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    keys_col = keys_col_ref[:, :]
    if guard:
        xf = jax.lax.shift_right_logical(keys_col, 2 * AXIS_BITS)
        yf = jax.lax.shift_right_logical(keys_col, AXIS_BITS) & (AXIS_MAX - 1)
        zf = keys_col & (AXIS_MAX - 1)
    valid_row = keys_col < SENT_KEY
    g_tile = g_ref[:, :].astype(jnp.bfloat16)           # (T, Cout)

    G = len(groups)

    def dma_pair(flat_idx, g, chunk, slot):
        su = bases_ref[flat_idx * G + g] + chunk * window
        start = pl.multiple_of(jnp.minimum(su, pad - window), 128)
        bq = flat_idx // tiles
        cpx = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bq * pad + start, window), :],
            win_x.at[g, slot], sem_x.at[g, slot])
        cpk = pltpu.make_async_copy(
            keys_hbm.at[pl.ds(0, 1), pl.ds(bq * pad + start, window)],
            win_k.at[g, slot], sem_k.at[g, slot])
        return su - start, cpx, cpk

    def issue(flat_idx, slot):
        for g in range(G):
            _, cpx, cpk = dma_pair(flat_idx, g, 0, slot)

            @pl.when(counts_ref[flat_idx * G + g] > 0)
            def _(cpx=cpx, cpk=cpk):
                cpx.start()
                cpk.start()

    slot = flat % 2

    @pl.when(flat == 0)
    def _first():
        issue(flat, slot)

    @pl.when(flat + 1 < total)
    def _next():
        issue(flat + 1, 1 - slot)

    def accum(g, shift, slot):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
        wk = jnp.where(cols >= shift, win_k[g, slot, :, :], -2)
        wx = win_x[g, slot, :, :]
        for k in groups[g]:
            q = keys_col + deltas[k]
            ok = valid_row
            if guard:
                dx, dy, dz = (v * scale for v in offs[k])
                if dx != 0:
                    ok = ok & ((xf + dx >= 0) & (xf + dx < AXIS_MAX))
                if dy != 0:
                    ok = ok & ((yf + dy >= 0) & (yf + dy < AXIS_MAX))
                if dz != 0:
                    ok = ok & ((zf + dz >= 0) & (zf + dz < AXIS_MAX))
            # q >= 0 guard: unguarded stride_parent queries go NEGATIVE at
            # scene boundaries (q = fine_key - delta) and must never hit the
            # -2 masked-lane sentinel above — real window keys are all >= 0,
            # so -1 matches nothing (advisor round 4)
            qm = jnp.where(ok & (q >= 0), q, -1)
            oh = jnp.where(wk == qm, jnp.float32(1),
                           jnp.float32(0)).astype(jnp.bfloat16)
            gath = jnp.dot(oh, wx, preferred_element_type=jnp.float32)
            dw_ref[k] += jax.lax.dot_general(
                gath.astype(jnp.bfloat16), g_tile,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    for g in range(G):
        cnt = counts_ref[flat * G + g]
        shift0, cpx, cpk = dma_pair(flat, g, 0, slot)

        def do_group(g=g, shift0=shift0, cpx=cpx, cpk=cpk):
            cpk.wait()
            cpx.wait()
            accum(g, shift0, slot)

            def chunk_body(c, _, g=g):
                shift, cpx2, cpk2 = dma_pair(flat, g, c, slot)
                cpx2.start()
                cpk2.start()
                cpk2.wait()
                cpx2.wait()
                accum(g, shift, slot)
                return 0

            jax.lax.fori_loop(1, cnt, chunk_body, 0)

        @pl.when(cnt > 0)
        def _(do_group=do_group):
            do_group()


@functools.partial(
    jax.jit,
    static_argnames=('kernel_size', 'stride_child', 'stride_parent', 'scale',
                     'guard', 'window', 'tile', 'interpret'))
def key_conv_dw(x, g, keys_in_b, keys_out_col, bases, counts, *,
                kernel_size=3, stride_child=False, stride_parent=False,
                scale=1, guard=True, window=WINDOW, tile=TILE, kdim=None,
                cin=None, cout=None, interpret=False):
    """dw[k] = sum_v x[match(key_out[v] + delta_k*scale)]^T g[v]."""
    Bp_in, cin_raw = x.shape
    cout_raw = g.shape[1]
    B, pad = keys_in_b.shape
    n_out = keys_out_col.shape[0]
    pad_out = n_out // B
    window = min(window, pad)
    offs = offsets_3d(kernel_size, stride_child=stride_child or stride_parent)
    sign = -1 if stride_parent else 1
    deltas = [sign * pack_delta(o, scale) for o in offs]
    groups = group_by_dx(offs)
    kdim = len(offs)
    tiles = pad_out // tile
    G = len(groups)
    cin_p, cout_p = _round128(cin_raw), _round128(cout_raw)
    xp = jnp.zeros((Bp_in, cin_p), jnp.bfloat16)
    xp = xp.at[:, :cin_raw].set(x.astype(jnp.bfloat16))
    # pad g in bf16: _dw_kernel consumes it as bf16 either way (values
    # identical), and the f32 pad was a (n_out, 128) ~512 MB transient on
    # the bs=8 backward at level 0
    gp = jnp.zeros((n_out, cout_p), jnp.bfloat16)
    gp = gp.at[:, :cout_raw].set(g.astype(jnp.bfloat16))

    def dw_call(groups_c, deltas_c, offs_c, bases_c, counts_c, kdim_c):
        Gc = len(groups_c)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, tiles),
            in_specs=[
                pl.BlockSpec((tile, 1), lambda b, t, *_: (b * tiles + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, cout_p),
                             lambda b, t, *_: (b * tiles + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((kdim_c, cin_p, cout_p),
                                   lambda b, t, *_: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((Gc, 2, window, cin_p), jnp.bfloat16),
                pltpu.VMEM((Gc, 2, 1, window), jnp.int32),
                pltpu.SemaphoreType.DMA((Gc, 2)),
                pltpu.SemaphoreType.DMA((Gc, 2)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_dw_kernel, groups=groups_c, deltas=deltas_c,
                              offs=offs_c, cin=cin_p, cout=cout_p,
                              window=window, pad=pad, tiles=tiles,
                              scale=scale, guard=guard, tile=tile),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((kdim_c, cin_p, cout_p),
                                           jnp.float32),
            interpret=interpret,
        )(bases_c.reshape(-1), counts_c.reshape(-1), keys_out_col, gp, xp,
          keys_in_b.reshape(1, -1))

    offs_t = [tuple(int(v) for v in o) for o in offs]
    out_bytes = kdim * cin_p * cout_p * 4
    win_bytes = G * window * (cin_p * 2 + 4)
    if out_bytes + 2 * win_bytes < 14 * 2 ** 20 or G == 1 or interpret:
        dw = dw_call(groups, deltas, offs_t, bases, counts, kdim)
        return dw[:, :cin_raw, :cout_raw]
    # Big-cin sites (dec blocks with 512-wide concat inputs): the whole
    # (K, cin, cout) f32 out block cannot sit in VMEM next to the windows
    # (measured 16.48M vs the 16M scoped limit). Split per dx-group: one
    # kernel per group with a (K/G, cin, cout) block — identical window DMA
    # volume, 3 launches instead of 1, the per-launch out block 1/3 the size.
    parts = []
    for gi, members in enumerate(groups):
        lo = members[0]
        assert list(members) == list(range(lo, lo + len(members))), (
            'per-group dw split needs contiguous offset indices per group '
            '(x-major enumeration guarantees it)')
        parts.append(dw_call(
            [list(range(len(members)))],
            [deltas[k] for k in members],
            [offs_t[k] for k in members],
            bases[:, :, gi:gi + 1], counts[:, :, gi:gi + 1], len(members)))
    dw = jnp.concatenate(parts, axis=0)
    return dw[:, :cin_raw, :cout_raw]


def _mirror_weights(w):
    """w'[k] = w[K-1-k]^T: the backward conv's weights (odd kernels enumerate
    x-major over symmetric ranges, so offset negation reverses the index)."""
    return jnp.transpose(w[::-1], (0, 2, 1))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10))
def key_conv_train(x, keys_in_b, keys_out_col, bases, counts, w,
                   kernel_size=3, scale=1, guard=True, window=WINDOW,
                   tile=TILE):
    """Differentiable same-level key conv (3^3 / 5^3).

    Backward needs NO extra plans: the gradient w.r.t. x is the same conv with
    mirrored-transposed weights (the delta SET is symmetric, so the per-tile
    window plans are identical), and dw accumulates through key_conv_dw over
    the same windows. The stride-2 down conv's backward is the transpose-conv
    structure instead (see ops.gather_conv dispatch).

    The plan reuse requires input space == output space (keys_out_col rows
    are the keys_in_b rows). The spatially-sharded path satisfies this by
    computing outputs over the whole [halo|local|halo] ext space and slicing
    the local rows afterwards (parallel/spatial.py sharded key_conv)."""
    return key_conv(x, keys_in_b, keys_out_col, bases, counts, w,
                    kernel_size=kernel_size, scale=scale, guard=guard,
                    window=window, tile=tile,
                    interpret=jax.default_backend() != 'tpu')


def _kct_fwd(x, keys_in_b, keys_out_col, bases, counts, w,
             kernel_size, scale, guard, window, tile):
    out = key_conv_train(x, keys_in_b, keys_out_col, bases, counts, w,
                         kernel_size, scale, guard, window, tile)
    # save x as bf16: the only consumer is key_conv_dw, whose kernel casts
    # to bf16 anyway — identical dw, HALF the activation memory held across
    # the backward (the difference between bs=8 training fitting HBM or not:
    # measured 16.0 vs 15.75 GB at 8x131072 rows). x[:0] carries the primal
    # dtype for the cotangent.
    return out, (x.astype(jnp.bfloat16), x[:1, :1], keys_in_b, keys_out_col,
                 bases, counts, w)


def _kct_bwd(kernel_size, scale, guard, window, tile, res, gout):
    x_bf, x_marker, keys_in_b, keys_out_col, bases, counts, w = res
    interp = jax.default_backend() != 'tpu'
    dx = key_conv(gout, keys_in_b, keys_out_col, bases, counts,
                  _mirror_weights(w), kernel_size=kernel_size, scale=scale,
                  guard=guard, window=window, tile=tile, interpret=interp)
    dx = dx[:, :x_bf.shape[1]].astype(x_marker.dtype)
    dw = key_conv_dw(x_bf, gout, keys_in_b, keys_out_col, bases, counts,
                     kernel_size=kernel_size, scale=scale, guard=guard,
                     window=window, tile=tile, interpret=interp)
    return (dx, None, None, None, None, dw.astype(w.dtype))


key_conv_train.defvjp(_kct_fwd, _kct_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def key_conv_down_train(x, keys_in_b, keys_out_col, bases, counts,
                        up_parent, up_widx, w, scale=1, window=WINDOW,
                        tile=TILE):
    """Differentiable stride-2 down conv. Backward w.r.t. x is the
    transpose-conv structure (every fine voxel has ONE parent and one weight
    slot): dx[v] = g[up_parent[v]] @ w[up_widx[v]]^T — ops.up_conv with
    transposed weights; dw accumulates via key_conv_dw.

    Under spatial sharding, x's rows are the fine EXT space and `up_parent`
    maps each ext fine row to its parent among THIS shard's local coarse
    output rows (sentinel = coarse pad -> zero contribution), so dx lands in
    the ext space and flows back through the halo exchange's transpose."""
    return key_conv(x, keys_in_b, keys_out_col, bases, counts, w,
                    kernel_size=2, stride_child=True, scale=scale,
                    guard=False, window=window, tile=tile,
                    interpret=jax.default_backend() != 'tpu')


def _kcd_fwd(x, keys_in_b, keys_out_col, bases, counts, up_parent, up_widx,
             w, scale, window, tile):
    out = key_conv_down_train(x, keys_in_b, keys_out_col, bases, counts,
                              up_parent, up_widx, w, scale, window, tile)
    return out, (x.astype(jnp.bfloat16), x[:1, :1], keys_in_b, keys_out_col,
                 bases, counts, up_parent, up_widx, w)


def _kcd_bwd(scale, window, tile, res, gout):
    from box2mask_tpu.sparse import ops
    (x_bf, x_marker, keys_in_b, keys_out_col, bases, counts, up_parent,
     up_widx, w) = res
    dx = ops.up_conv(gout, up_parent, up_widx,
                     jnp.transpose(w, (0, 2, 1)))[:, :x_bf.shape[1]]
    interp = jax.default_backend() != 'tpu'
    dw = key_conv_dw(x_bf, gout, keys_in_b, keys_out_col, bases, counts,
                     kernel_size=2, stride_child=True, scale=scale,
                     guard=False, window=window, tile=tile, interpret=interp)
    return (dx.astype(x_marker.dtype), None, None, None, None, None, None,
            dw.astype(w.dtype))


key_conv_down_train.defvjp(_kcd_fwd, _kcd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def key_conv_down_plan_train(x, keys_in_b, keys_out_col, bases, counts,
                             bases_u, counts_u, w, scale=1, window=WINDOW):
    """Differentiable stride-2 down conv whose backward runs the
    stride_parent KERNEL over the up plans (kcu_base/cnt) instead of
    ops.up_conv's einsum+gather — the einsum materializes a U*8*C f32
    intermediate and row-gathers V rows at the slow XLA gather rate
    (up L1->L0 measured 19.4 ms vs 5.1 windowed, round-4 journal), and it
    sat on the TRAINING backward path of every down conv. Used when the
    batch carries kcu plans; the up_parent/up_widx variant
    (key_conv_down_train) remains for spatial sharding."""
    return key_conv(x, keys_in_b, keys_out_col, bases, counts, w,
                    kernel_size=2, stride_child=True, scale=scale,
                    guard=False, window=window,
                    interpret=jax.default_backend() != 'tpu')


def _kcdp_fwd(x, keys_in_b, keys_out_col, bases, counts, bases_u, counts_u,
              w, scale, window):
    out = key_conv_down_plan_train(x, keys_in_b, keys_out_col, bases, counts,
                                   bases_u, counts_u, w, scale, window)
    return out, (x.astype(jnp.bfloat16), x[:1, :1], keys_in_b, keys_out_col,
                 bases, counts, bases_u, counts_u, w)


def _kcdp_bwd(scale, window, res, gout):
    (x_bf, x_marker, keys_in_b, keys_out_col, bases, counts, bases_u,
     counts_u, w) = res
    interp = jax.default_backend() != 'tpu'
    B = keys_in_b.shape[0]
    coarse_b = keys_out_col.reshape(B, -1)
    fine_col = keys_in_b.reshape(-1, 1)
    dx = key_conv(gout, coarse_b, fine_col, bases_u, counts_u,
                  jnp.transpose(w, (0, 2, 1)), kernel_size=2,
                  stride_parent=True, scale=scale, guard=False,
                  window=WINDOW_UP, interpret=interp)
    dx = dx[:, :x_bf.shape[1]].astype(x_marker.dtype)
    dw = key_conv_dw(x_bf, gout, keys_in_b, keys_out_col, bases, counts,
                     kernel_size=2, stride_child=True, scale=scale,
                     guard=False, window=window, interpret=interp)
    return (dx, None, None, None, None, None, None, dw.astype(w.dtype))


key_conv_down_plan_train.defvjp(_kcdp_fwd, _kcdp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def key_conv_up_train(x, keys_coarse_b, keys_fine_col, bases_u, counts_u,
                      keys_fine_b, keys_coarse_col, bases_d, counts_d, w,
                      scale=1, window=WINDOW):
    """Differentiable stride-2 TRANSPOSE conv (level l+1 -> l) as a key
    match (see key_conv stride_parent). Replaces ops.up_conv's
    einsum-then-row-gather, which is gather-bandwidth bound (the U*8*C f32
    intermediate + a V-row gather measured 20 ms at level 1->0 vs ~15 ms for
    a full 27-offset 96ch conv — scripts/profile_levels.py round-4 table).

    Backward w.r.t. x is the stride-2 DOWN conv of the cotangent with
    transposed weights over the (l -> l+1) plans the batch already carries
    (kcd_base/cnt); dw accumulates via key_conv_dw over the up plans."""
    return key_conv(x, keys_coarse_b, keys_fine_col, bases_u, counts_u, w,
                    kernel_size=2, stride_parent=True, scale=scale,
                    guard=False, window=window,
                    interpret=jax.default_backend() != 'tpu')


def _kcu_fwd(x, keys_coarse_b, keys_fine_col, bases_u, counts_u,
             keys_fine_b, keys_coarse_col, bases_d, counts_d, w,
             scale, window):
    out = key_conv_up_train(x, keys_coarse_b, keys_fine_col, bases_u,
                            counts_u, keys_fine_b, keys_coarse_col, bases_d,
                            counts_d, w, scale, window)
    return out, (x.astype(jnp.bfloat16), x[:1, :1], keys_coarse_b,
                 keys_fine_col, bases_u, counts_u, keys_fine_b,
                 keys_coarse_col, bases_d, counts_d, w)


def _kcu_bwd(scale, window, res, gout):
    (x_bf, x_marker, keys_coarse_b, keys_fine_col, bases_u, counts_u,
     keys_fine_b, keys_coarse_col, bases_d, counts_d, w) = res
    x = x_bf
    interp = jax.default_backend() != 'tpu'
    # NB the down-structure plans (bases_d/counts_d) were built at the
    # standard WINDOW (host_conv_plans kcd); `window` here is the UP plan's
    # (WINDOW_UP) — chunk counts only line up with the window they were
    # built for
    dx = key_conv(gout, keys_fine_b, keys_coarse_col, bases_d, counts_d,
                  jnp.transpose(w, (0, 2, 1)), kernel_size=2,
                  stride_child=True, scale=scale, guard=False,
                  window=WINDOW, interpret=interp)
    dx = dx[:, :x.shape[1]].astype(x_marker.dtype)
    dw = key_conv_dw(x, gout, keys_coarse_b, keys_fine_col, bases_u,
                     counts_u, kernel_size=2, stride_parent=True,
                     scale=scale, guard=False, window=window,
                     interpret=interp)
    return (dx, None, None, None, None, None, None, None, None,
            dw.astype(w.dtype))


key_conv_up_train.defvjp(_kcu_fwd, _kcu_bwd)
