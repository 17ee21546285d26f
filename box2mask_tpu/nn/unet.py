"""SelectionNet: the 7-down/7-up sparse voxel U-Net with per-oversegment voting heads.

Topology-parity with the reference (models/detection_net.py:13-27,34-230):
  * stem 5^3 conv -> 32 ch at stride 1,
  * 7 encoder stages (stride-2 2^3 conv + BN + ReLU + `layers` BasicBlocks) with
    block widths (32, 64, 128, 256, 256, 256, 256) at strides 2..128,
  * 7 decoder stages (stride-2 transpose conv + BN + ReLU + skip-concat + blocks)
    with widths (256, 256, 256, 256, 128, 96, 96) back down to stride 1,
  * per-oversegment average (or max) pooling of the final 96-d voxel features
    (reference's batch-column pooling trick, detection_net.py:345-352 — here a
    segment mean, sparse/ops.py),
  * head MLPs (Linear-ReLU-BN x2 + Linear) per configured head
    (detection_net.py:170-226): offsets(3), bounds(3), bb_scores(1),
    center_scores(1), semantics(C), per_vox_semantics(C).

The forward consumes a `SparseBatch` dict (sparse/coords.py + datasets/batching.py):
padded pyramid + neighbor maps + voxel features + pooling ids.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from box2mask_tpu.nn.modules import (
    BasicBlock, Linear1x1, MaskedBatchNorm, SparseConv, SparseConvTranspose)
from box2mask_tpu.sparse import ops

INIT_DIM = 32
ENC_PLANES = (32, 64, 128, 256, 256, 256, 256)      # blocks at levels 1..7
DEC_PLANES = (256, 256, 256, 256, 128, 96, 96)      # tr-conv/block out, levels 6..0
OUT_DIM = 96


class HeadMLP(nn.Module):
    """3-layer 1x1-conv MLP head (reference detection_net.py:170-194)."""
    out_dim: int
    hidden: int = 96
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.bfloat16
    act_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, n_valid, train: bool):
        # hidden activations ride act_dtype (the per-vox heads see level-0
        # row counts); the head OUTPUT stays f32 for the losses
        h = Linear1x1(self.hidden, compute_dtype=self.compute_dtype)(x)
        h = nn.relu(h.astype(self.act_dtype))
        h = MaskedBatchNorm(axis_name=self.axis_name,
                            act_dtype=self.act_dtype)(h, valid, n_valid, train)
        h = Linear1x1(self.hidden, compute_dtype=self.compute_dtype)(h)
        h = nn.relu(h.astype(self.act_dtype))
        h = MaskedBatchNorm(axis_name=self.axis_name,
                            act_dtype=self.act_dtype)(h, valid, n_valid, train)
        return Linear1x1(self.out_dim, compute_dtype=self.compute_dtype)(h)


class SelectionNet(nn.Module):
    num_classes: int
    heads: Tuple[str, ...] = ('mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
                              'mlp_semantics')
    layers: int = 2
    do_segment_pooling: bool = True
    max_pool_segments: bool = False
    mlp_bounds_relu: bool = False
    stem_kernel: int = 5
    axis_name: Optional[str] = None
    compute_dtype: jnp.dtype = jnp.bfloat16
    use_pallas: bool = False
    # activation dtype between ops (--bf16_acts): params, BN stats, losses
    # and head outputs stay f32; conv/BN/relu/skip activations (and the
    # autodiff residuals stored for backward) narrow to bf16, roughly
    # halving the stored-activation footprint — what lets the bs=8
    # ScanNet-scale train step run WITHOUT block remat on a 16 GB chip
    # (config.needs_remat's bf16 branch)
    act_dtype: jnp.dtype = jnp.float32
    # rematerialize BasicBlocks in the backward (jax.checkpoint): trades
    # extra forward FLOPs for not storing the block-internal activations —
    # what lets bs=8 ScanNet-scale training fit one chip's 16 GB HBM
    # (measured 262 MB over without it). Parameter tree is IDENTICAL
    # with/without, so checkpoints interchange freely. remat_max_level
    # bounds WHICH levels remat: activation bytes concentrate at the
    # shallow wide levels (level-0 holds ~131k rows/scene vs ~10 at level
    # 7), so rematting only levels <= remat_max_level frees almost all the
    # memory while re-forwarding only those levels' convs; 7 = every level
    # (the conservative default).
    remat: bool = False
    remat_max_level: int = 7

    @nn.compact
    def __call__(self, batch, train: bool = True):
        cd = self.compute_dtype
        ax = self.axis_name
        up = self.use_pallas
        ad = self.act_dtype

        def bn(name):
            return MaskedBatchNorm(axis_name=ax, act_dtype=ad, name=name)

        def conv_operand(l, kind):
            """nmap array, or the key_conv plan dict when the batch carries
            window plans (sparse/key_conv.py; inference fast path)."""
            plan = {'3': f'kc3_base{l}', '5': f'kc5_base{l}',
                    'd': f'kcd_base{l}'}[kind]
            if plan not in batch:
                return batch[{'3': f'nmap3_{l}', '5': 'nmap5_0',
                              'd': f'down{l}'}[kind]]
            out_l = l + 1 if kind == 'd' else l
            op = dict(keys_in=batch[f'keys{l}_b'],
                      keys_out_col=batch[f'keys{out_l}_b'].reshape(-1, 1),
                      bases=batch[plan],
                      counts=batch[plan.replace('base', 'cnt')],
                      static=(({'3': 3, '5': self.stem_kernel,
                                'd': 2}[kind]),
                              kind == 'd', 1 << l))
            if kind == 'd':           # backward = transpose-conv structure
                if f'kcu_base{l}' in batch:
                    # plan-based backward (key_conv_down_plan_train): the
                    # stride_parent kernel over the up plans replaces the
                    # einsum+gather transpose
                    op['bases_u'] = batch[f'kcu_base{l}']
                    op['counts_u'] = batch[f'kcu_cnt{l}']
                else:
                    op['up_parent'] = batch[f'up_parent{l}']
                    op['up_widx'] = batch[f'up_widx{l}']
            return op

        def blocks(x, level, planes, stage):
            nbr = conv_operand(level, '3')
            v, n = batch[f'valid{level}'], batch[f'num{level}']
            block_cls, nbr_arr, nbr_static = BasicBlock, nbr, None
            if self.remat and level <= self.remat_max_level:
                # self(0), x(1), nbr(2), valid(3), n_valid(4), train(5),
                # nbr_static(6)
                block_cls = nn.remat(BasicBlock, static_argnums=(5, 6))
                if isinstance(nbr, dict) and 'static' in nbr:
                    nbr_static = nbr['static']
                    nbr_arr = {k: v2 for k, v2 in nbr.items()
                               if k != 'static'}
            for i in range(self.layers):
                x = block_cls(planes, axis_name=ax, compute_dtype=cd,
                              use_pallas=up, act_dtype=ad,
                              name=f'{stage}_block{i}')(x, nbr_arr, v, n,
                                                        train, nbr_static)
            return x

        # ---- stem (stride 1)
        x = SparseConv(INIT_DIM, self.stem_kernel ** 3, compute_dtype=cd,
                       use_pallas=up, act_dtype=ad,
                       name='stem_conv')(batch['vox_features'],
                                         conv_operand(0, '5'))
        x = bn('stem_bn')(x, batch['valid0'], batch['num0'], train)
        x = nn.relu(x)
        stem_out = x

        # ---- encoder: levels 1..7
        skips = [stem_out]
        for l in range(1, 8):
            x = SparseConv(x.shape[-1], 8, compute_dtype=cd, use_pallas=up,
                           act_dtype=ad, name=f'down{l}_conv')(x, conv_operand(l - 1, 'd'))
            x = bn(f'down{l}_bn')(x, batch[f'valid{l}'], batch[f'num{l}'], train)
            x = nn.relu(x)
            x = blocks(x, l, ENC_PLANES[l - 1], f'enc{l}')
            skips.append(x)

        # ---- decoder: levels 6..0 (skip connections from encoder levels 6..0)
        for i, l in enumerate(range(6, -1, -1)):
            kc_up = None
            if f'kcu_base{l}' in batch:
                # stride_parent key_conv transpose (sparse/key_conv.py);
                # backward's down-structure conv reuses the kcd_{l} plans
                kc_up = dict(
                    keys_in=batch[f'keys{l + 1}_b'],
                    keys_out_col=batch[f'keys{l}_b'].reshape(-1, 1),
                    bases=batch[f'kcu_base{l}'],
                    counts=batch[f'kcu_cnt{l}'],
                    keys_fine=batch[f'keys{l}_b'],
                    keys_coarse_col=batch[f'keys{l + 1}_b'].reshape(-1, 1),
                    bases_d=batch[f'kcd_base{l}'],
                    counts_d=batch[f'kcd_cnt{l}'],
                    scale=1 << l)
            x = SparseConvTranspose(DEC_PLANES[i], compute_dtype=cd,
                                    use_pallas=up, act_dtype=ad,
                                    name=f'up{l}_tr')(
                x, batch.get(f'up_parent{l}'), batch.get(f'up_widx{l}'),
                kc=kc_up)           # kc batches ship no up_parent (wire win)
            x = bn(f'up{l}_bn')(x, batch[f'valid{l}'], batch[f'num{l}'], train)
            x = nn.relu(x)
            x = jnp.concatenate([x, skips[l]], axis=-1)
            x = blocks(x, l, DEC_PLANES[i], f'dec{l}')

        outputs = {}
        requires_vox = any('per_vox' in h for h in self.heads)
        if requires_vox:
            outputs['vox_feats'] = x

        if self.do_segment_pooling:
            pooled = ops.segment_pool(
                x, batch['pooling_ids'], batch['seg_valid'].shape[0],
                mode='max' if self.max_pool_segments else 'avg')
            pv, pn = batch['seg_valid'], batch['num_segments']
        else:
            pooled, pv, pn = x, batch['valid0'], batch['num0']

        head_dims = {'mlp_offsets': 3, 'mlp_bounds': 3, 'mlp_bb_scores': 1,
                     'mlp_center_scores': 1, 'mlp_semantics': self.num_classes,
                     'mlp_per_vox_semantics': self.num_classes}
        for head in self.heads:
            if 'per_vox' in head:
                out = HeadMLP(head_dims[head], axis_name=ax, compute_dtype=cd,
                              act_dtype=ad, name=head)(
                    x, batch['valid0'], batch['num0'], train)
            else:
                out = HeadMLP(head_dims[head], axis_name=ax, compute_dtype=cd,
                              act_dtype=ad, name=head)(pooled, pv, pn, train)
            if self.mlp_bounds_relu and head == 'mlp_bounds':
                out = nn.relu(out)
            outputs[head] = out
        return outputs
