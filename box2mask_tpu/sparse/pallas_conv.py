"""Pallas TPU kernel: fused gather-GEMM sparse convolution.

XLA's row gather materializes every gathered copy in HBM and runs far below
HBM bandwidth, making ``sum_k gather(x, nbr[:,k]) @ w[k]`` the throughput
ceiling of the whole network. This kernel exploits a structural property of
our neighbor maps (sparse/coords.py, sparse/device_maps.py): coordinates are
sorted by packed key, so for every kernel offset k the valid entries of
``nbr[:, k]`` are strictly increasing, and for a tile of T consecutive output
rows the input rows needed by ALL offsets lie in one contiguous window.

Per output tile the kernel:
  1. DMAs the union window from HBM into VMEM in W-row chunks (dynamic chunk
     count via fori_loop; one chunk in the common case),
  2. "gathers" within VMEM as one-hot matmuls on the MXU — ``onehot_k(T, W) @
     window(W, Cin)`` — no per-row addressing anywhere,
  3. applies the offset weight and accumulates the output tile in VMEM.

Missing neighbors (sentinel == Vin) give all-zero one-hot rows, so no zero row
or epilogue masking is needed. Backward falls back to the XLA formulation via
custom_vjp (see ops.gather_conv) — inference is the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256        # output rows per block
WINDOW = 2048     # input rows per DMA chunk


def _kernel(nbr_ref, w_ref, x_hbm, out_ref, win_ref, sem, *, vin, cin, cout,
            kdim):
    idx = nbr_ref[:, :]                       # (T, K) int32
    valid = idx < vin
    big = jnp.int32(2 ** 30)
    base = jnp.min(jnp.where(valid, idx, big))
    base = jnp.where(base == big, 0, base)
    base = (base // 32) * 32        # sublane-align dynamic DMA starts
    top = jnp.max(jnp.where(valid, idx, 0))
    nchunks = jnp.where(jnp.any(valid), (top - base) // WINDOW + 1, 0)

    def chunk_body(c, acc):
        start = pl.multiple_of(base + c * WINDOW, 32)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(start, WINDOW), :], win_ref,
                                   sem)
        cp.start()
        cp.wait()
        window = win_ref[:]
        # fold validity into rel: invalid/missing -> -1, which never matches
        # the iota columns (avoids mixed bool layouts that trip Mosaic)
        rel = jnp.where(valid, idx - start, -1)        # (T, K)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, WINDOW), 1)

        # static unroll over offsets (dynamic_slice by a traced k is not
        # lowerable in Mosaic)
        for k in range(kdim):
            rk = rel[:, k][:, None]
            # arithmetic one-hot: i1 -> bf16 relayouts trip Mosaic, so build
            # it as f32 select then downcast
            onehot = jnp.where(cols == rk, jnp.float32(1),
                               jnp.float32(0)).astype(jnp.bfloat16)
            g = jnp.dot(onehot, window, preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(g.astype(jnp.bfloat16), w_ref[k],
                                preferred_element_type=jnp.float32)
        return acc

    out_ref[:] = jax.lax.fori_loop(
        0, nchunks, chunk_body, jnp.zeros((TILE, cout), jnp.float32))


def _round128(c):
    return ((c + 127) // 128) * 128


def _pallas_forward(x, nbr, w, interpret=False):
    vin, cin_raw = x.shape
    vout, kdim = nbr.shape
    cout_raw = w.shape[2]
    assert vout % TILE == 0, f'vout {vout} must be a multiple of {TILE}'
    # channel dims padded to the 128-lane tiling; rows padded so window DMAs
    # past the end stay in bounds
    cin, cout = _round128(cin_raw), _round128(cout_raw)
    xp = jnp.zeros((vin + WINDOW, cin), jnp.bfloat16)
    xp = xp.at[:vin, :cin_raw].set(x.astype(jnp.bfloat16))
    wp = jnp.zeros((kdim, cin, cout), jnp.bfloat16)
    wp = wp.at[:, :cin_raw, :cout_raw].set(w.astype(jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_kernel, vin=vin, cin=cin, cout=cout, kdim=kdim),
        grid=(vout // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, kdim), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full weights
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vout, cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((WINDOW, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(nbr, wp, xp)
    return out[:, :cout_raw]


@jax.custom_vjp
def sparse_conv(x, nbr, w):
    """out[v] = sum_k x[nbr[v,k]] @ w[k]; nbr sentinel == x.shape[0]."""
    return _pallas_forward(x, nbr, w)


def _fwd(x, nbr, w):
    return _pallas_forward(x, nbr, w), (x, nbr, w)


def _bwd(res, g):
    x, nbr, w = res
    # XLA fallback backward (correct, not kernel-optimized):
    #   dx[nbr[v,k]] += g[v] @ w[k].T ; dw[k] = gather(x)^T @ g
    vin, cin = x.shape
    K = nbr.shape[1]
    xz = jnp.concatenate([x, jnp.zeros((1, cin), x.dtype)], axis=0)
    dx = jnp.zeros((vin + 1, cin), jnp.float32)
    dws = []
    gb = g.astype(jnp.bfloat16)
    for k in range(K):
        idx = nbr[:, k]
        gk = jnp.take(xz, idx, axis=0)                       # (V, Cin)
        dws.append(jnp.einsum('vc,vd->cd', gk.astype(jnp.bfloat16), gb,
                              preferred_element_type=jnp.float32))
        contrib = jnp.dot(gb, w[k].astype(jnp.bfloat16).T,
                          preferred_element_type=jnp.float32)
        dx = dx.at[idx].add(contrib)
    return dx[:vin].astype(x.dtype), None, jnp.stack(dws).astype(w.dtype)


sparse_conv.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------- row gather
def _gather_kernel(idx_ref, x_hbm, out_ref, win_ref, sem, *, vin, cin):
    idx = idx_ref[:, 0]
    valid = idx < vin
    big = jnp.int32(2 ** 30)
    base = jnp.min(jnp.where(valid, idx, big))
    base = jnp.where(base == big, 0, base)
    base = (base // 32) * 32        # sublane-align dynamic DMA starts
    top = jnp.max(jnp.where(valid, idx, 0))
    nchunks = jnp.where(jnp.any(valid), (top - base) // WINDOW + 1, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, WINDOW), 1)

    def chunk_body(c, acc):
        start = pl.multiple_of(base + c * WINDOW, 32)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(start, WINDOW), :], win_ref,
                                   sem)
        cp.start()
        cp.wait()
        rel = jnp.where(valid, idx - start, -1)
        onehot = jnp.where(cols == rel[:, None], jnp.float32(1),
                           jnp.float32(0)).astype(jnp.bfloat16)
        return acc + jnp.dot(onehot, win_ref[:],
                             preferred_element_type=jnp.float32)

    out_ref[:] = jax.lax.fori_loop(0, nchunks, chunk_body,
                                   jnp.zeros((TILE, cin), jnp.float32))


def gather_rows(x, idx, interpret=False):
    """out[i] = x[idx[i]] (0 when idx == x.shape[0]); idx valid entries must be
    monotone (sorted-coordinate property). Used by the transpose conv."""
    vin, cin_raw = x.shape
    n = idx.shape[0]
    assert n % TILE == 0
    cin = _round128(cin_raw)
    xp = jnp.zeros((vin + WINDOW, cin), jnp.bfloat16)
    xp = xp.at[:vin, :cin_raw].set(x.astype(jnp.bfloat16))
    out = pl.pallas_call(
        functools.partial(_gather_kernel, vin=vin, cin=cin),
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, cin), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cin), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WINDOW, cin), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(idx[:, None], xp)
    return out[:, :cin_raw]
