"""Neural AM training loop: cross-entropy on forced-alignment labels.

SURVEY.md §1 L4 (neural path): optax AdamW, jitted train step; the
data-parallel multi-chip variant wraps the same step in shard_map
(mogasr.dist.sharded).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mogasr.am.neural import build_model, frame_ce_loss
from mogasr.config import TrainConfig


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=max(cfg.num_nn_steps // 20, 1),
        decay_steps=max(cfg.num_nn_steps, 2),
    )
    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )


def init_train_state(
    model, cfg: TrainConfig, feat_dim: int, key: jax.Array
) -> TrainState:
    dummy = jnp.zeros((2, 8, feat_dim), jnp.float32)
    # keep only the "params" collection: init also returns any collections
    # sown during the trace (MoeAm's "losses"), which must not enter the
    # trainable tree / optimizer state / checkpoint template
    params = {"params": model.init(key, dummy, jnp.asarray([8, 8]))["params"]}
    opt = make_optimizer(cfg)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def make_train_step(model, cfg: TrainConfig, spec_augment: bool = False):
    opt = make_optimizer(cfg)
    if spec_augment:
        from mogasr.am.neural import spec_augment as _sa

    @jax.jit
    def train_step(
        state: TrainState,
        feats: jax.Array,    # [B, T, D]
        n_frames: jax.Array,  # [B]
        labels: jax.Array,   # [B, T]
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if spec_augment:
            key = jax.random.fold_in(jax.random.key(cfg.seed), state.step)
            feats_in = _sa(feats, n_frames, key)
        else:
            feats_in = feats

        def loss_fn(params):
            # mutable=["losses"] collects aux losses modules sow (MoeAm's
            # load-balance terms); archs that sow nothing yield an empty
            # dict, so this is one code path for every architecture.
            logits, mut = model.apply(
                params, feats_in, n_frames, mutable=["losses"])
            ce, acc = frame_ce_loss(logits, labels)
            aux = sum(jax.tree_util.tree_leaves(mut.get("losses", {})),
                      start=jnp.zeros(()))
            return ce + cfg.moe_lb_weight * aux, (ce, acc)

        (loss, (ce, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            # "loss" = the TOTAL optimized objective (CE + lb-weighted aux);
            # "ce" isolates the CE term so logs stay comparable across archs
            # whether or not they sow aux losses (ADVICE r4: reporting the
            # CE term under the name "loss" silently changed its semantic)
            "loss": loss,
            "ce": ce,
            "frame_acc": acc,
        }

    return train_step


def make_eval_step(model):
    @jax.jit
    def eval_step(params, feats, n_frames, labels):
        logits = model.apply(params, feats, n_frames)
        loss, acc = frame_ce_loss(logits, labels)
        return {"loss": loss, "frame_acc": acc}

    return eval_step
