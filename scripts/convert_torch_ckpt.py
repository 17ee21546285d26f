#!/usr/bin/env python
"""Convert a reference (PyTorch + MinkowskiEngine) Box2Mask checkpoint into
this framework's flax checkpoint format — the weight-for-weight parity anchor
(SURVEY.md §7 'Checkpoint compatibility'; released ckpt: reference
README.md:75).

Name mapping (reference models/detection_net.py:34-230, models/resnet.py:46-83
-> box2mask_tpu/nn/unet.py):

  conv0p1s1 / bn0                      -> stem_conv / stem_bn
  conv{1..4}p*s2 / bn{1..4}            -> down{1..4}_conv / down{1..4}_bn
  added_conv{1..3}* / added_bn{1..3}   -> down{5..7}_conv / down{5..7}_bn
  block{1..4}.{i}                      -> enc{1..4}_block{i}
  added_block{1..3}.{i}                -> enc{5..7}_block{i}
  added_convtr4p128s2 / added_bntr4    -> up6_tr / up6_bn   (added_block4 -> dec6)
  added_convtr5p64s2  / added_bntr5    -> up5_tr / up5_bn   (added_block5 -> dec5)
  added_convtr6p32s2  / added_bntr6    -> up4_tr / up4_bn   (added_block6 -> dec4)
  convtr4p16s2 / bntr4                 -> up3_tr / up3_bn   (block5 -> dec3)
  convtr5p8s2  / bntr5                 -> up2_tr / up2_bn   (block6 -> dec2)
  convtr6p4s2  / bntr6                 -> up1_tr / up1_bn   (block7 -> dec1)
  convtr7p2s2  / bntr7                 -> up0_tr / up0_bn   (block8 -> dec0)
  block internals: conv1/norm1/conv2/norm2 -> SparseConv_0/MaskedBatchNorm_0/
    SparseConv_1/MaskedBatchNorm_1; downsample.{0,1} -> downsample_conv/_bn
  heads: mlp_offsets/mlp_bounds/mlp_score/mlp_center_score/mlp_semantics/
    mlp_per_vox_semantics -> mlp_offsets/mlp_bounds/mlp_bb_scores/
    mlp_center_scores/mlp_semantics/mlp_per_vox_semantics, Sequential indices
    {0,3,6} -> Linear1x1_{0,1,2}, {2,5} -> MaskedBatchNorm_{0,1}
  final{0,1,2}* (--load_unused_head back-compat heads,
    detection_net.py:142-166) are dropped: they are dead weights kept by the
    reference only so strict state_dict loads of old checkpoints succeed.

Kernel layout: ME stores cubic-kernel weights as (K, Cin, Cout) with offsets
enumerated FIRST-coordinate-fastest (x fastest); our kernel_offsets
(sparse/coords.py:43-53) enumerate z fastest, so kernel rows are permuted by
the 3-D index transpose. ME 1x1 convs store a 2-D (Cin, Cout) matrix ==
Linear1x1. BatchNorm: weight/bias -> scale/bias params; running_mean/var ->
batch_stats mean/var.

VALIDATION STATUS of the ME offset order: the x-fastest claim comes from
MinkowskiEngine's kernel-region generator (its KernelRegion iterates the
first coordinate in the innermost loop); it has NOT been validated against a
live ME install or the released checkpoint in this environment (no ME, no
checkpoint download — the roundtrip test tests/test_ckpt_convert.py proves
self-consistency only). When the released checkpoint is available, run
`evaluate.py --config configs/scannet.txt --fixed_seed 10` on the converted
tree and compare val mAP50 against the paper's Table 1 before trusting the
conversion; a wrong order permutes every cubic kernel and shows up as a
large mAP drop, not a subtle one.

Usage:
  python scripts/convert_torch_ckpt.py --config configs/scannet.txt \
      --torch_ckpt checkpoint_101h:54m:35s_366875.1301574707.tar \
      [--out_dir experiments/scannet/checkpoints]

Accepts the torch .tar (loaded with the baked-in CPU torch) or an .npz export
of the state_dict.
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


# --------------------------------------------------------------- permutations
def cubic_perm_me_to_ours(k):
    """perm[i_ours] = i_me for a k^3 kernel: ME enumerates offsets x-fastest,
    ours z-fastest (sparse/coords.py kernel_offsets) — a 3-D index transpose."""
    idx = np.arange(k ** 3).reshape(k, k, k)       # [x][y][z] in OUR order
    # our linear index i_ours = (x*k + y)*k + z; ME's = (z*k + y)*k + x
    me = np.transpose(idx, (2, 1, 0)).reshape(-1)  # me[i_ours... ] careful:
    # idx.transpose(2,1,0)[x,y,z] == idx[z,y,x] = (z*k+y)*k+x == i_me(x,y,z)
    return me


def convert_conv_kernel(w, transpose=False):
    """ME (K, Cin, Cout) -> ours (K, Cin, Cout) with offset-order permutation.
    K=1 (1x1) kernels are 2-D matrices in ME and stay as-is."""
    w = np.asarray(w, np.float32)
    if w.ndim == 2:
        return w
    K = w.shape[0]
    k = round(K ** (1 / 3))
    assert k ** 3 == K, f'non-cubic kernel volume {K}'
    perm = cubic_perm_me_to_ours(k)
    return w[perm]


# ------------------------------------------------------------- name mapping
def _block_entry(t_block, t_idx, f_stage):
    """Mapping rows for one BasicBlock: torch '{t_block}.{t_idx}.' prefix ->
    flax '{f_stage}_block{t_idx}' subtree."""
    tp = f'{t_block}.{t_idx}.'
    fp = (f'{f_stage}_block{t_idx}',)
    rows = []
    for t_conv, f_conv in (('conv1', 'SparseConv_0'), ('conv2', 'SparseConv_1')):
        rows.append((tp + t_conv + '.kernel', fp + (f_conv, 'kernel'), 'conv'))
    for t_bn, f_bn in (('norm1', 'MaskedBatchNorm_0'),
                       ('norm2', 'MaskedBatchNorm_1')):
        rows += _bn_rows(tp + t_bn, fp + (f_bn,))
    rows.append((tp + 'downsample.0.kernel', fp + ('downsample_conv', 'kernel'),
                 'conv'))
    rows += _bn_rows(tp + 'downsample.1', fp + ('downsample_bn',))
    return rows


def _bn_rows(t_prefix, f_path):
    return [
        (t_prefix + '.bn.weight', f_path + ('scale',), 'param'),
        (t_prefix + '.bn.bias', f_path + ('bias',), 'param'),
        (t_prefix + '.bn.running_mean', f_path + ('mean',), 'stat'),
        (t_prefix + '.bn.running_var', f_path + ('var',), 'stat'),
    ]


HEAD_NAMES = {   # torch module name -> flax head name (cfg head names)
    'mlp_offsets': 'mlp_offsets', 'mlp_bounds': 'mlp_bounds',
    'mlp_score': 'mlp_bb_scores', 'mlp_center_score': 'mlp_center_scores',
    'mlp_semantics': 'mlp_semantics',
    'mlp_per_vox_semantics': 'mlp_per_vox_semantics',
}


def build_mapping(layers=2):
    """-> list of (torch_key, flax_path_tuple, kind). kind: conv | param | stat.
    flax paths are relative to the params/batch_stats tree root."""
    rows = [('conv0p1s1.kernel', ('stem_conv', 'kernel'), 'conv')]
    rows += _bn_rows('bn0', ('stem_bn',))
    enc = [('conv1p1s2', 'bn1', 'block1', 1), ('conv2p2s2', 'bn2', 'block2', 2),
           ('conv3p4s2', 'bn3', 'block3', 3), ('conv4p8s2', 'bn4', 'block4', 4),
           ('added_conv1p16s2', 'added_bn1', 'added_block1', 5),
           ('added_conv2p32s2', 'added_bn2', 'added_block2', 6),
           ('added_conv3p64s2', 'added_bn3', 'added_block3', 7)]
    for t_conv, t_bn, t_block, lvl in enc:
        rows.append((t_conv + '.kernel', (f'down{lvl}_conv', 'kernel'), 'conv'))
        rows += _bn_rows(t_bn, (f'down{lvl}_bn',))
        for i in range(layers):
            rows += _block_entry(t_block, i, f'enc{lvl}')
    dec = [('added_convtr4p128s2', 'added_bntr4', 'added_block4', 6),
           ('added_convtr5p64s2', 'added_bntr5', 'added_block5', 5),
           ('added_convtr6p32s2', 'added_bntr6', 'added_block6', 4),
           ('convtr4p16s2', 'bntr4', 'block5', 3),
           ('convtr5p8s2', 'bntr5', 'block6', 2),
           ('convtr6p4s2', 'bntr6', 'block7', 1),
           ('convtr7p2s2', 'bntr7', 'block8', 0)]
    for t_conv, t_bn, t_block, lvl in dec:
        rows.append((t_conv + '.kernel', (f'up{lvl}_tr', 'kernel'), 'conv'))
        rows += _bn_rows(t_bn, (f'up{lvl}_bn',))
        for i in range(layers):
            rows += _block_entry(t_block, i, f'dec{lvl}')
    for t_head, f_head in HEAD_NAMES.items():
        for seq_idx, f_lin in ((0, 'Linear1x1_0'), (3, 'Linear1x1_1'),
                               (6, 'Linear1x1_2')):
            rows.append((f'{t_head}.{seq_idx}.kernel',
                         (f_head, f_lin, 'kernel'), 'conv'))
            rows.append((f'{t_head}.{seq_idx}.bias',
                         (f_head, f_lin, 'bias'), 'param'))
        for seq_idx, f_bn in ((2, 'MaskedBatchNorm_0'),
                              (5, 'MaskedBatchNorm_1')):
            rows += _bn_rows(f'{t_head}.{seq_idx}', (f_head, f_bn))
    return rows


# ------------------------------------------------------------------- convert
def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(sd, layers=2, strict=False):
    """torch-format state_dict (str -> array) -> (params, batch_stats) nested
    dicts. Unmatched torch keys (unused heads final*, num_batches_tracked,
    heads absent from the flax model) are reported, not fatal."""
    sd = {re.sub(r'^module\.', '', k): np.asarray(v) for k, v in sd.items()}
    params, stats = {}, {}
    used = set()
    for t_key, f_path, kind in build_mapping(layers):
        if t_key not in sd:
            continue
        v = np.asarray(sd[t_key], np.float32)
        if kind == 'conv':
            v = convert_conv_kernel(v)
        if kind == 'stat':
            _set(stats, f_path, v)
        else:
            _set(params, f_path, v)
        used.add(t_key)
    leftover = [k for k in sd if k not in used
                and not k.endswith('num_batches_tracked')
                and not k.startswith('final')]
    if leftover:
        msg = f'{len(leftover)} torch keys had no flax target: {leftover[:10]}'
        if strict:
            raise ValueError(msg)
        print('NOTE:', msg)
    dropped = [k for k in sd if k.startswith('final')]
    if dropped:
        print(f'Dropped {len(dropped)} --load_unused_head back-compat keys '
              '(final*): dead weights in the reference too')
    return params, stats


def load_torch_tar(path):
    import torch
    payload = torch.load(path, map_location='cpu')
    sd = payload.get('model_state_dict', payload)
    return ({k: v.detach().numpy() for k, v in sd.items()},
            payload if isinstance(payload, dict) else {})


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=None,
                    help='config preset (for exp/checkpoint dirs + layers)')
    ap.add_argument('--torch_ckpt', required=True,
                    help='.tar torch checkpoint or .npz state_dict export')
    ap.add_argument('--out_dir', default=None)
    ap.add_argument('--layers', type=int, default=None)
    args, rest = ap.parse_known_args(argv)

    from box2mask_tpu.config import get_config
    cfg = get_config((['--config', args.config] if args.config else []) + rest)
    layers = args.layers or cfg.layers

    if args.torch_ckpt.endswith('.npz'):
        sd = dict(np.load(args.torch_ckpt))
        meta = {}
    else:
        sd, meta = load_torch_tar(args.torch_ckpt)
    params, stats = convert_state_dict(sd, layers=layers)

    # verify against the flax template tree
    import jax
    from box2mask_tpu.engine import state as S
    from box2mask_tpu.datasets.tables import get_tables
    valid_ids, _, _, _ = get_tables(
        cfg.dataset_name if cfg.dataset_name != 'synthetic' else 'scannet')
    model = S.build_model(cfg, len(valid_ids))
    import __graft_entry__  # noqa: F401  (synthetic batch builder)
    from __graft_entry__ import _make_batch
    import copy
    small = copy.copy(cfg)
    small.vox_bucket, small.seg_bucket = 1024, 128
    batch = {k: np.asarray(v) for k, v in _make_batch(small).items()}
    import jax.numpy as jnp
    variables = S.init_variables(
        model, {k: jnp.asarray(v) for k, v in batch.items()})
    tmpl_p = jax.tree.map(np.shape, variables['params'])
    got_p = jax.tree.map(np.shape, params)
    import flax
    missing = set(map(str, jax.tree_util.tree_leaves_with_path(tmpl_p))) - \
        set(map(str, jax.tree_util.tree_leaves_with_path(
            flax.core.freeze(got_p).unfreeze())))
    if missing:
        print(f'WARNING: {len(missing)} flax leaves not covered by the torch '
              f'checkpoint (e.g. head mismatch): {sorted(missing)[:6]}')

    from box2mask_tpu.engine.checkpoint import save_checkpoint
    from box2mask_tpu.engine.state import TrainState, make_optimizer
    tx = make_optimizer(cfg)
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=tx.init(params), step=jnp.int32(0))
    m = re.search(r'_([0-9]+(\.[0-9]+)?)\.(tar|pth|ckpt)$',
                  os.path.basename(args.torch_ckpt))
    t_time = float(meta.get('training_time',
                            m.group(1) if m else 0.0))
    out_dir = args.out_dir or cfg.checkpoint_path
    path = save_checkpoint(out_dir, state, t_time,
                           int(meta.get('epoch', 0)),
                           int(meta.get('iteration_num', 0)))
    print(f'Converted checkpoint written: {path}')
    return path


if __name__ == '__main__':
    main()
