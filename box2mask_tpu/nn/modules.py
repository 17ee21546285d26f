"""Flax building blocks for the sparse U-Net: sparse convs, masked batch norm,
residual blocks.

These mirror the *behavior* of the reference's MinkowskiEngine modules
(models/resnet.py:46-83 BasicBlock, ME.MinkowskiBatchNorm, kaiming init at
models/resnet.py:139-146) on top of the gather-GEMM substrate in sparse/ops.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from box2mask_tpu.sparse import ops


def kaiming_fan_out(key, shape, dtype=jnp.float32):
    """He-normal with fan_out = K * Cout (matches ME.utils.kaiming_normal_
    mode='fan_out', nonlinearity='relu'; reference models/resnet.py:142)."""
    if len(shape) == 3:
        fan_out = shape[0] * shape[2]
    else:
        fan_out = shape[-1]
    std = jnp.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def nbr_kernel_volume(nbr):
    """Kernel volume of a conv operand: nmap column count, or derived from a
    key_conv window-plan dict (sparse/key_conv.py), or the nmap column count
    of a spatial halo operand (parallel/spatial.py)."""
    if isinstance(nbr, dict):
        if 'spatial_kc' in nbr:
            ksize, stride_child, _ = nbr['spatial_kc']
            return 8 if stride_child else ksize ** 3
        if 'slab_left' in nbr:
            return nbr['nmap'].shape[-1]
        ksize, stride_child, _ = nbr['static']
        return 8 if stride_child else ksize ** 3
    return nbr.shape[-1]


class SparseConv(nn.Module):
    """Sparse conv driven by a precomputed neighbor map or a key_conv
    window-plan operand.

    act_dtype is the dtype activations LEAVE this module in (f32 default;
    bf16 under the --bf16_acts policy). The conv itself always accumulates
    f32 on the MXU; the cast only bounds what downstream ops (and the
    autodiff residuals XLA stores for their backward) keep in HBM — at
    bs=8 ScanNet scale the stored-activation footprint is what decides
    whether the no-remat train step fits a 16 GB chip (config.needs_remat).
    """
    features: int
    kernel_volume: int          # 27 for 3^3, 8 for 2^3 down, 125 for 5^3 stem
    use_bias: bool = False      # ME convs default to bias=False
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nbr):
        w = self.param('kernel', kaiming_fan_out,
                       (self.kernel_volume, x.shape[-1], self.features))
        out = ops.gather_conv(x, nbr, w, compute_dtype=self.compute_dtype,
                              use_pallas=self.use_pallas)
        if self.use_bias:
            out = out + self.param('bias', nn.initializers.zeros, (self.features,))
        return out.astype(self.act_dtype)


class SparseConvTranspose(nn.Module):
    """Stride-2 transpose conv (level l+1 -> l) via up_conv (or the
    stride_parent key_conv kernel when the batch ships 'kcu' plans)."""
    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_coarse, parent, widx, kc=None):
        w = self.param('kernel', kaiming_fan_out, (8, x_coarse.shape[-1], self.features))
        return ops.up_conv(x_coarse, parent, widx, w,
                           compute_dtype=self.compute_dtype,
                           use_pallas=self.use_pallas,
                           kc=kc).astype(self.act_dtype)


class Linear1x1(nn.Module):
    """1x1 sparse conv == per-row dense (head MLP layers, detection_net.py:170-194)."""
    features: int
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param('kernel', kaiming_fan_out, (x.shape[-1], self.features))
        b = self.param('bias', nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        return ops.linear(x, w, b, compute_dtype=self.compute_dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over *valid* rows only, torch-style momentum + running stats.

    MinkowskiBatchNorm normalizes over all active voxels of the batch; our padding
    rows must be excluded exactly (DESIGN.md). With `axis_name` set, batch statistics
    are summed across the mesh axis — SyncBatchNorm semantics
    (reference models/model.py:25) for free under shard_map.
    """
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    # dtype the normalized output leaves in (--bf16_acts policy); moments,
    # running stats and the normalize arithmetic itself stay f32 — only the
    # stored activation narrows
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, n_valid, train: bool):
        feat = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (feat,))
        bias = self.param('bias', nn.initializers.zeros, (feat,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones(feat, jnp.float32))
        if train:
            mean, var, n = ops.masked_moments(x, valid, n_valid, self.axis_name)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon)
        return ((x - mean) * (inv * scale) + bias).astype(self.act_dtype)


class BasicBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN + residual (+1x1 projection on channel change) + ReLU.
    Reference: models/resnet.py:46-83."""
    features: int
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nbr, valid, n_valid, train: bool, nbr_static=None):
        # nbr_static: the key_conv operand's 'static' tuple passed separately
        # so nn.remat can mark it static (a tuple leaf inside the nbr pytree
        # would be traced by jax.checkpoint); see nn/unet.py remat wiring
        if nbr_static is not None:
            nbr = dict(nbr)
            nbr['static'] = nbr_static
        residual = x
        ad = self.act_dtype
        kv = nbr_kernel_volume(nbr)
        out = SparseConv(self.features, kv,
                         compute_dtype=self.compute_dtype,
                         use_pallas=self.use_pallas, act_dtype=ad)(x, nbr)
        out = MaskedBatchNorm(axis_name=self.axis_name,
                              act_dtype=ad)(out, valid, n_valid, train)
        out = nn.relu(out)
        out = SparseConv(self.features, kv,
                         compute_dtype=self.compute_dtype,
                         use_pallas=self.use_pallas, act_dtype=ad)(out, nbr)
        out = MaskedBatchNorm(axis_name=self.axis_name,
                              act_dtype=ad)(out, valid, n_valid, train)
        if residual.shape[-1] != self.features:
            residual = Linear1x1(self.features, use_bias=False,
                                 compute_dtype=self.compute_dtype,
                                 name='downsample_conv')(residual)
            residual = MaskedBatchNorm(axis_name=self.axis_name, act_dtype=ad,
                                       name='downsample_bn')(
                residual, valid, n_valid, train)
        return nn.relu(out + residual.astype(ad))
