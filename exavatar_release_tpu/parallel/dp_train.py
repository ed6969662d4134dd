"""Data-parallel avatar training over a device mesh.

New capability vs the reference (single GPU, batch_size=1 hard limit,
reference avatar/main/config.py:44-45): a batch of frames is sharded over
the mesh's ``data`` axis, each device runs the full forward/backward on its
frames, gradients are ``psum``-ed across the axis (XLA lowers this to ICI /
DCN all-reduce), and the replicated parameters take one optimizer step.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..avatar import scene as sc
from ..avatar.config import AvatarConfig
from ..avatar.model import FrameData, forward_frame, total_loss
from ..ops.rasterizer.api import RasterizeSettings
from ..train.loop import ModelBundle, TrainState


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch_to_mesh(batch_tree, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) axis of every leaf over ``mesh[axis]``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch_tree)


@functools.partial(
    jax.jit,
    static_argnames=(
        "optimizer", "cfg", "is_warmup", "fit_pose_to_test", "settings",
        "mesh", "axis",
    ),
)
def dp_train_step(
    state: TrainState,
    bundle: ModelBundle,
    frames: FrameData,  # leaves lead with the GLOBAL batch axis B = D * b
    keys: jax.Array,  # (B, 2) per-frame PRNG keys (uint32)
    optimizer: optax.GradientTransformation,
    cfg: AvatarConfig,
    mesh: Mesh,
    axis: str = "data",
    is_warmup: bool = False,
    fit_pose_to_test: bool = False,
    settings: RasterizeSettings = RasterizeSettings(),
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One DP step over a frame batch: per-device vmap over local frames,
    cross-device gradient psum, one replicated parameter update."""
    C = state.trainables.scene.mean.shape[0]

    def frame_loss(trainables, frame: FrameData, key):
        bg = jax.random.uniform(jax.random.wrap_key_data(key), (3,))
        m2d = jnp.zeros((C, 2))

        def inner(tr, m2d_offset):
            out = forward_frame(
                tr, state.scene_aux, bundle.buffers, bundle.prior,
                bundle.statics, bundle.id_info, bundle.lpips,
                bundle.face_texture, bundle.face_texture_mask,
                bundle.init_joint_offset, frame, bg, cfg,
                is_warmup=is_warmup, mode="train",
                fit_pose_to_test=fit_pose_to_test, settings=settings,
                scene_mean2d_offset=m2d_offset,
            )
            return total_loss(out.losses), out

        (tot, out), grads = jax.value_and_grad(inner, argnums=(0, 1), has_aux=True)(
            trainables, m2d
        )
        return tot, grads[0], grads[1], out.scene_is_vis, out.scene_radius

    def device_fn(trainables, local_frames, local_keys):
        # local_frames leaves lead with the per-device batch axis b
        tot, g_tr, g_m2d, vis, radius = jax.vmap(
            frame_loss, in_axes=(None, 0, 0)
        )(trainables, local_frames, local_keys)
        b_local = tot.shape[0]
        b_global = b_local * jax.lax.psum(1, axis)
        # mean over the global batch
        scale = 1.0 / b_global
        g_tr = jax.tree.map(lambda g: jax.lax.psum(jnp.sum(g, 0), axis) * scale, g_tr)
        loss_mean = jax.lax.psum(jnp.sum(tot), axis) * scale
        # densify stats: accumulate per-frame like the reference's per-item
        # loop (model.py:282-285) — sum of grad norms, any-visibility
        g_m2d_sum = jax.lax.psum(jnp.sum(g_m2d, 0), axis)
        vis_any = jax.lax.psum(jnp.sum(vis.astype(jnp.int32), 0), axis) > 0
        radius_max = jax.lax.pmax(jnp.max(radius, 0), axis)
        return g_tr, loss_mean, g_m2d_sum, vis_any, radius_max

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    g_tr, loss_mean, g_m2d, vis_any, radius_max = sharded(
        state.trainables, frames, keys
    )
    updates, opt_state = optimizer.update(g_tr, state.opt_state, state.trainables)
    trainables = optax.apply_updates(state.trainables, updates)

    scene_state = sc.SceneState(state.trainables.scene, state.scene_aux)
    scene_state = sc.track_stats(
        scene_state, g_m2d, vis_any, radius_max,
        img_shape=(int(frames.img.shape[-2]), int(frames.img.shape[-1])),
    )
    aux = scene_state.aux.replace(
        active_sh_degree=jnp.minimum(
            state.itr // cfg.increase_sh_degree_interval, cfg.max_sh_degree
        ).astype(jnp.float32)
    )
    return (
        TrainState(
            trainables=trainables, opt_state=opt_state, scene_aux=aux,
            itr=state.itr + 1,
        ),
        {"total": loss_mean},
    )
