"""Combined data x tile parallel avatar training over a 2-axis device mesh.

The full north-star layout (SURVEY.md §5; new capability vs the reference's
single-GPU DataParallel vestige, avatar/common/base.py:125): the mesh is
("data", "tile") — frames are sharded over "data" (classic DP with gradient
psum), and within each data group the rasterization of every render is
row-band-sharded over "tile" (ops.rasterizer.api.RasterizeSettings
in_shard_axis -> parallel.sharded_raster.rasterize_in_context).

Gradient accounting: each tile chip computes the SAME per-frame loss from
the all-gathered full image, scaled by 1/D_tile. psum over ("data","tile")
then yields the exact global-batch mean loss, and — because the band
all_gather's transpose reduce-scatters pixel cotangents back to band
owners — the exact parameter gradients, with no fudge factors. The
replicated model compute (LBS, MLPs, losses) is duplicated across the tile
axis; the rasterizer (>90% of step time at 1080p, SURVEY.md §3.1) is what
scales.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..avatar import scene as sc
from ..avatar.config import AvatarConfig
from ..avatar.model import FrameData, forward_frame, total_loss
from ..ops.rasterizer.api import RasterizeSettings
from ..train.loop import ModelBundle, TrainState


@functools.partial(
    jax.jit,
    static_argnames=(
        "optimizer", "cfg", "is_warmup", "fit_pose_to_test", "settings",
        "mesh", "data_axis", "tile_axis",
    ),
)
def dp_tile_train_step(
    state: TrainState,
    bundle: ModelBundle,
    frames: FrameData,  # leaves lead with the GLOBAL batch axis B = D_data * b
    keys: jax.Array,  # (B, 2) per-frame PRNG keys (uint32)
    optimizer: optax.GradientTransformation,
    cfg: AvatarConfig,
    mesh: Mesh,
    data_axis: str = "data",
    tile_axis: str = "tile",
    is_warmup: bool = False,
    fit_pose_to_test: bool = False,
    settings: RasterizeSettings = RasterizeSettings(),
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One combined step: DP over frames x row-band-sharded rendering."""
    C = state.trainables.scene.mean.shape[0]
    d_tile = mesh.shape[tile_axis]
    settings_band = dataclasses.replace(
        settings, in_shard_axis=tile_axis, in_shard_size=d_tile,
        mesh=None,
    )
    both = (data_axis, tile_axis)

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
                fit_pose_to_test=fit_pose_to_test, settings=settings_band,
                scene_mean2d_offset=m2d_offset,
            )
            # 1/D_tile: every tile chip computes this same loss; the psum
            # over the tile axis below restores it exactly (and scales the
            # band cotangents correctly through the all_gather transpose)
            return total_loss(out.losses) / d_tile, out

        (tot, out), grads = jax.value_and_grad(
            inner, argnums=(0, 1), has_aux=True
        )(trainables, m2d)
        return tot, grads[0], grads[1], out.scene_is_vis, out.scene_radius

    def device_fn(trainables, local_frames, local_keys):
        tot, g_tr, g_m2d, vis, radius = jax.vmap(
            frame_loss, in_axes=(None, 0, 0)
        )(trainables, local_frames, local_keys)
        b_local = tot.shape[0]
        b_global = b_local * jax.lax.psum(1, data_axis)
        scale = 1.0 / b_global
        g_tr = jax.tree.map(
            lambda g: jax.lax.psum(jnp.sum(g, 0), both) * scale, g_tr
        )
        loss_mean = jax.lax.psum(jnp.sum(tot), both) * scale
        # densify stats (reference model.py:282-285). radius/vis are
        # replicated across tile chips, so max/any over both axes is exact.
        g_m2d_sum = jax.lax.psum(jnp.sum(g_m2d, 0), both)
        vis_any = jax.lax.psum(jnp.sum(vis.astype(jnp.int32), 0), both) > 0
        radius_max = jax.lax.pmax(jnp.max(radius, 0), both)
        return g_tr, loss_mean, g_m2d_sum, vis_any, radius_max

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis)),
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
