"""Optimizer: Adam(eps=1e-15) with named parameter groups + schedules.

Reference semantics (avatar/common/base.py:83-108 + module get_optimizable_params):
* scene mean: Plenoxels exponential schedule scaled by the camera spread
  radius (base.py:20-53,87-92);
* scene features/opacity/scale/rotation: constant group LRs;
* human nets + per-frame SMPL-X params: staged decay (/10 after 75%,
  /100 after 95% of training, base.py:94-108).

TPU redesign: ONE ``optax.scale_by_adam`` over the whole trainable pytree
(so Adam moments are plain pytrees the densifier can surgically zero — the
functional replacement of the reference's optimizer-state splicing,
module.py:17-72), followed by a per-leaf learning-rate transform driven by
a label pytree. Everything is traceable; the step count lives in the optax
state.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..avatar.config import AvatarConfig
from ..avatar.model import AvatarTrainables


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Plenoxels log-linear decay (reference base.py:20-53), traceable."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t
        )
        return delay * log_lerp

    return sched


def staged_decay_schedule(base_lr: float, tot_itr: int) -> Callable:
    """/10 after 75%, /100 after 95% (reference base.py:94-108)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.where(
            step > 0.95 * tot_itr,
            base_lr / 100.0,
            jnp.where(step > 0.75 * tot_itr, base_lr / 10.0, base_lr),
        )
        return lr

    return sched


def group_label_tree(trainables: AvatarTrainables) -> AvatarTrainables:
    """Label pytree: same structure as the trainables, str leaves."""

    def label_of(path) -> str:
        names = [getattr(p, "name", None) for p in path]
        if names and names[0] == "scene":
            return f"scene_{names[1]}"
        if names and names[0] == "human":
            return "human"
        return "smplx"

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: label_of(path), trainables
    )


def make_schedules(
    cfg: AvatarConfig,
    cam_dist_radius: float,
    tot_itr: int,
    fit_pose_to_test: bool = False,
) -> Dict[str, Callable]:
    if fit_pose_to_test:
        # only per-frame SMPL-X params move (reference model.py:20-21,
        # config.py:63-66: lr 1e-3 in that mode)
        zero = lambda step: jnp.asarray(0.0)
        return {
            "scene_mean": zero, "scene_feature_dc": zero,
            "scene_feature_rest": zero, "scene_opacity": zero,
            "scene_scale": zero, "scene_rotation": zero, "human": zero,
            "smplx": staged_decay_schedule(1e-3, tot_itr),
        }
    r = float(cam_dist_radius)
    const = lambda v: (lambda step: jnp.asarray(v, jnp.float32))
    return {
        "scene_mean": expon_lr_schedule(
            cfg.position_lr_init * r, cfg.position_lr_final * r,
            lr_delay_mult=cfg.position_lr_delay_mult,
            max_steps=cfg.position_lr_max_steps,
        ),
        "scene_feature_dc": const(cfg.feature_lr),
        "scene_feature_rest": const(cfg.feature_lr / 20.0),
        "scene_opacity": const(cfg.opacity_lr),
        "scene_scale": const(cfg.scale_lr),
        "scene_rotation": const(cfg.rotation_lr),
        "human": staged_decay_schedule(cfg.lr, tot_itr),
        "smplx": staged_decay_schedule(cfg.smplx_param_lr, tot_itr),
    }


class GroupLRState(NamedTuple):
    count: jnp.ndarray


def scale_by_group_schedules(labels, schedules: Dict[str, Callable]):
    """Per-leaf negative LR scaling by group label."""

    def init_fn(params):
        return GroupLRState(count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        step = state.count
        upd = jax.tree.map(
            lambda g, lab: -schedules[lab](step) * g, updates, labels
        )
        return upd, GroupLRState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    trainables: AvatarTrainables,
    cfg: AvatarConfig,
    cam_dist_radius: float,
    tot_itr: int,
    fit_pose_to_test: bool = False,
) -> optax.GradientTransformation:
    labels = group_label_tree(trainables)
    schedules = make_schedules(cfg, cam_dist_radius, tot_itr, fit_pose_to_test)
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
        scale_by_group_schedules(labels, schedules),
    )


def _structural_map_slots(opt_state, optimizer, mask_tree, fn):
    """Apply ``fn`` to every optimizer slot mirroring a True leaf of
    ``mask_tree`` (a params-shaped bool tree), via optax.tree_map_params —
    robust to ANY transform chain (round-1 verdict: tuple-unpacking broke
    the moment a transform was added). Scalar per-param bookkeeping slots
    (e.g. zero_nans flags) are left untouched."""
    def g(slot, sel):
        if sel and getattr(slot, "ndim", 0) >= 1:
            return fn(slot)
        return slot

    return optax.tree_map_params(optimizer, g, opt_state, mask_tree)


def _scene_mask(trainables, opacity_only: bool = False):
    mask = jax.tree.map(lambda _: False, trainables)
    if opacity_only:
        scene_mask = jax.tree.map(lambda _: False, trainables.scene)
        scene_mask = scene_mask.replace(opacity=True)
    else:
        scene_mask = jax.tree.map(lambda _: True, trainables.scene)
    return mask.replace(scene=scene_mask)


def zero_scene_moments(opt_state, reset_mask: jnp.ndarray,
                       optimizer=None, trainables=None):
    """Zero Adam mu/nu of scene rows flagged by ``reset_mask`` (the
    functional replacement of the reference's optimizer surgery at
    module.py:17-72: new/freed rows restart with zero moments).

    With ``optimizer``+``trainables`` the slots are found structurally; the
    legacy path assumes the default (adam_state, lr_state) pair."""
    def zero_rows(x):
        m = reset_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    if optimizer is not None:
        return _structural_map_slots(
            opt_state, optimizer, _scene_mask(trainables), zero_rows
        )

    adam_state, lr_state = opt_state

    def fix(tree):
        return tree.replace(scene=jax.tree.map(zero_rows, tree.scene))

    new_adam = adam_state._replace(mu=fix(adam_state.mu), nu=fix(adam_state.nu))
    return (new_adam, lr_state)


def zero_opacity_moments(opt_state, optimizer=None, trainables=None):
    """Zero only the scene-opacity moments (opacity reset, reference
    module.py:246-251 via replace_param_from_optimizer)."""
    if optimizer is not None:
        return _structural_map_slots(
            opt_state, optimizer, _scene_mask(trainables, opacity_only=True),
            jnp.zeros_like,
        )

    adam_state, lr_state = opt_state

    def fix(tree):
        return tree.replace(
            scene=tree.scene.replace(opacity=jnp.zeros_like(tree.scene.opacity))
        )

    new_adam = adam_state._replace(mu=fix(adam_state.mu), nu=fix(adam_state.nu))
    return (new_adam, lr_state)
