"""Fitting optimizer loop: one jitted Adam step with traced stage masks.

Reference behavior (fitting/main/fit.py:63-131 + common/base.py:41-63):
3 epochs x per-batch inner optimization (500/250 itrs); stage 1 (epoch 0,
itr < 100) unlocks only root poses + translations; then everything; the
last epoch freezes shared identity params; LR starts at 1e-1 (1e-2 later
epochs) and steps down by 10x at fixed itrs. The reference REBUILDS the
torch Adam at each stage change (fresh moments + bias correction); here the
stage is a gradient mask over ONE compiled step, and the driver calls
``reinit_opt_on_stage_change`` at stage boundaries so the moment/count
restart matches the reference's rebuild exactly (differentially tested
against torch.optim.Adam in tests/test_fitting.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .config import FittingConfig
from .model import FitFrameData, FitStatics, fitting_forward
from .params import FittingParams, stage_mask_tree


class FitState(NamedTuple):
    params: FittingParams
    opt_state: Any


def make_fit_optimizer() -> optax.GradientTransformation:
    """Adam(eps=1e-15 like the avatar half? — the fitting harness uses the
    torch default eps=1e-8, reference fitting/common/base.py:47-48) with
    externally supplied LR (scaled in the step)."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def init_fit_state(params: FittingParams, optimizer) -> FitState:
    return FitState(params=params, opt_state=optimizer.init(params))


def reinit_opt_on_stage_change(
    state: FitState, optimizer, prev_stage, stage
) -> Tuple[FitState, Tuple]:
    """Fresh Adam moments/step-count when the (root_only, allow_shared)
    membership changes — the functional equivalent of the reference
    rebuilding torch.optim.Adam per stage (fitting/common/base.py:41-63).
    ``stage``/``prev_stage`` are host-side tuples; returns the (possibly
    reset) state and the new prev_stage."""
    if prev_stage is not None and stage == prev_stage:
        return state, stage
    return state._replace(opt_state=optimizer.init(state.params)), stage


def stage_flags(cfg: FittingConfig, epoch: int, itr: int):
    """(lr, root_only, allow_shared, warmup, hand_joint_offset) host-side."""
    return (
        cfg.lr_at(epoch, itr),
        cfg.root_only(epoch, itr),
        not cfg.freeze_shared(epoch),
        cfg.is_warmup(epoch, itr),
        cfg.hand_joint_offset(epoch, itr),
    )


@functools.partial(jax.jit, static_argnames=("optimizer",))
def fit_step(
    state: FitState,
    statics: FitStatics,
    frames: FitFrameData,
    frame_rows: jnp.ndarray,
    optimizer,
    lr,  # traced scalar
    root_only,  # traced bool
    allow_shared,  # traced bool
    warmup,  # traced bool
    hand_joint_offset,  # traced bool
) -> Tuple[FitState, Dict[str, jnp.ndarray]]:
    def loss_fn(params):
        losses = fitting_forward(
            params, statics, frames, frame_rows, warmup, hand_joint_offset
        )
        return sum(losses.values()), losses

    (tot, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    mask = stage_mask_tree(state.params, root_only, allow_shared)
    grads = jax.tree.map(lambda g, m: g * m, grads, mask)

    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    losses = dict(losses)
    losses["total"] = tot
    return FitState(params=params, opt_state=opt_state), losses
