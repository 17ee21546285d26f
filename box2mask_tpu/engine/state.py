"""Train state + jitted step factories.

The reference couples these in Trainer.train_step / Model.compute_loss
(models/training.py:63-70, models/model.py:33). Here they are pure functions:
`train_step(state, batch, lr, bb_w, cs_w) -> (state, metrics)` compiled once; the
learning rate and the delayed-start head weights enter as traced scalars so epoch
changes never retrace.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from box2mask_tpu.nn import losses as L
from box2mask_tpu.nn.unet import SelectionNet


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def ensure_maps(batch):
    """If the batch is a device-maps batch (carries per-level 'keys{l}_b'
    pyramids instead of neighbor maps), build every conv neighbor map
    on-device (sparse/device_maps.py). Works inside jit — pad sizes come from
    the static key-array shapes. Host-provided valid0/batch0/num0 win on
    collision.

    key_conv batches (carrying 'kc3_base0' window plans) skip the neighbor
    maps entirely: the convs match keys in-window inside the pallas kernel
    (sparse/key_conv.py), so only the per-level valid masks / counts and the
    transpose-conv weight slots remain to derive here."""
    if 'keys0_b' not in batch:
        return batch
    import jax.numpy as jnp
    from box2mask_tpu.sparse import device_maps as DM
    if 'kc3_base0' in batch:
        A = DM.AXIS_BITS
        maps = {}
        for l in range(DM.NUM_LEVELS):
            kb = batch[f'keys{l}_b'].reshape(-1)
            v = kb < DM.SENT_KEY
            maps[f'valid{l}'] = v
            maps[f'num{l}'] = jnp.sum(v).astype(jnp.int32)
            if l < DM.NUM_LEVELS - 1:
                # transpose-conv weight slot = bit l of each field
                xb = jax.lax.shift_right_logical(kb, 2 * A + l) & 1
                yb = jax.lax.shift_right_logical(kb, A + l) & 1
                zb = jax.lax.shift_right_logical(kb, l) & 1
                maps[f'up_widx{l}'] = (xb * 4 + yb * 2 + zb).astype(jnp.int32)
        maps.update(batch)
        return maps
    keys_b = tuple(batch[f'keys{l}_b'] for l in range(DM.NUM_LEVELS))
    maps = DM.build_batch_maps_from_keys(keys_b)
    merged = dict(maps)
    merged.update(batch)          # host valid0/batch0/num0 take precedence
    return merged


def materialize_maps(batch):
    """Eager (host-callable) ensure_maps for init paths."""
    return ensure_maps(batch)


def make_optimizer(cfg):
    """Adam/Adadelta/RMSprop selected by cfg.optimizer (training.py:37-42); LR is
    injected per-step (inject_hyperparams) to implement the cosine schedule."""
    name = cfg.optimizer.lower()
    if name == 'adam':
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    elif name == 'adadelta':
        opt = optax.inject_hyperparams(optax.adadelta)(learning_rate=cfg.lr)
    elif name == 'rmsprop':
        opt = optax.inject_hyperparams(optax.rmsprop)(learning_rate=cfg.lr)
    else:
        raise ValueError(f'unknown optimizer {cfg.optimizer}')
    return opt


def build_model(cfg, num_classes, axis_name=None, remat=None):
    """remat=None follows cfg.remat (training); inference callers pass
    remat=False — checkpointing only matters under backward, and keeping it
    out of the eval trace keeps the compiled-program cache identical across
    train-time and inference-only configs."""
    import jax.numpy as jnp
    compute_dtype = {'bfloat16': jnp.bfloat16, 'float32': jnp.float32}[
        cfg.compute_dtype]
    if remat is None:
        remat = bool(getattr(cfg, 'remat', False))
    # pallas kernel currently ~matches the XLA gather path on v5e; keep it
    # opt-in ('on') until it wins (auto == off for now)
    use_pallas = getattr(cfg, 'pallas_conv', 'auto') == 'on'
    return SelectionNet(
        num_classes=num_classes,
        heads=tuple(cfg.network_heads),
        layers=cfg.layers,
        do_segment_pooling=cfg.do_segment_pooling,
        max_pool_segments=cfg.max_pool_segments_detection_net,
        mlp_bounds_relu=cfg.mlp_bounds_relu,
        axis_name=axis_name,
        compute_dtype=compute_dtype,
        use_pallas=bool(use_pallas),
        act_dtype=(jnp.bfloat16 if getattr(cfg, 'bf16_acts', False)
                   else jnp.float32),
        remat=bool(remat),
        remat_max_level=int(getattr(cfg, 'remat_levels', 7)))


def init_variables(model, sample_batch, seed=0, train=False):
    """Jitted flax init: one compiled program instead of eager op-by-op
    dispatch (~37s -> ~5s per process on CPU) and it lands in the persistent
    compile cache, so every later process (trainer restarts, eval, CLI
    subprocesses in tests) skips the work entirely."""
    sample_batch = materialize_maps(sample_batch)
    return jax.jit(model.init, static_argnames=('train',))(
        jax.random.PRNGKey(seed), sample_batch, train=train)


def init_state(cfg, model, tx, sample_batch, seed=0):
    variables = init_variables(model, sample_batch, seed=seed)
    params = variables['params']
    return TrainState(params=params, batch_stats=variables['batch_stats'],
                      opt_state=tx.init(params), step=jnp.int32(0))


def make_train_step(cfg, model, tx, axis_name=None, donate=True):
    def loss_fn(params, batch_stats, batch, bb_w, cs_w):
        batch = ensure_maps(batch)
        out, mut = model.apply({'params': params, 'batch_stats': batch_stats},
                               batch, train=True, mutable=['batch_stats'])
        ld = L.compute_losses(cfg, out, batch, bb_w, cs_w)
        return ld['optimization_loss'], (ld, mut['batch_stats'])

    def step(state, batch, lr, bb_w, cs_w):
        (_, (ld, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   bb_w, cs_w)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            ld = jax.lax.pmean(ld, axis_name)
        opt_state = state.opt_state
        opt_state.hyperparams['learning_rate'] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1), ld

    if axis_name is not None:
        return step                     # caller wraps in shard_map
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_val_step(cfg, model):
    def step(state, batch, bb_w, cs_w):
        batch = ensure_maps(batch)
        out = model.apply({'params': state.params,
                           'batch_stats': state.batch_stats}, batch, train=False)
        return L.compute_losses(cfg, out, batch, bb_w, cs_w)
    return jax.jit(step)


def make_forward(cfg, model):
    """Eval forward returning raw head outputs (get_prediction equivalent,
    detection_net.py:493-517; min_bb clamp happens on host in detection2mask)."""
    def fwd(params, batch_stats, batch):
        batch = ensure_maps(batch)
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           batch, train=False)
    return jax.jit(fwd)


def head_weights(cfg, epoch):
    """Delayed-start loss weights (models/model.py:136-137,179)."""
    bb_w = cfg.loss_weight_bb_scores or 0.0
    if epoch < cfg.mlp_bb_scores_start_epoch:
        bb_w = 0.0
    cs_w = cfg.loss_weight_center_scores or 0.0
    if epoch < cfg.mlp_center_scores_start_epoch:
        cs_w = 0.0
    return float(bb_w), float(cs_w)
