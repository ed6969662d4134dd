"""Scene (background) 3D Gaussians: fixed-capacity state + densification.

Functional re-design of the reference's ``SceneGaussian`` module and its
in-place Adam-state surgery (reference avatar/common/nets/module.py:17-272).
The reference grows/shrinks parameter tensors every densify step and
reaches into the torch optimizer to splice moment buffers — both hostile to
XLA. Here the scene lives in a CAPACITY-sized buffer with a ``live`` mask:

* clone/split/prune become pure masked gather/scatter at fixed shapes, so
  the jitted train step never recompiles;
* "new row" bookkeeping returns a ``reset_mask`` the trainer uses to zero
  the corresponding optax Adam moments (replacing cat/prune/replace
  surgery at module.py:17-72);
* compaction is unnecessary — dead rows render with zero alpha.

Split into an optimizable ``SceneParams`` pytree (optax leaves) and a
non-optimized ``SceneAux`` (live mask, densify statistics, camera spread).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..core.rotations import matrix_to_rotation_6d, rotation_6d_to_matrix, matrix_to_quaternion
from ..core.sh import eval_sh_dynamic, rgb_to_sh
from ..ops.knn import mean_knn_dist_sq
from .config import AvatarConfig
from .gaussians import GaussianAssets


@flax.struct.dataclass
class SceneParams:
    """Optimizable per-Gaussian parameters (capacity C rows)."""

    mean: jnp.ndarray  # (C, 3)
    scale: jnp.ndarray  # (C, 3) log-scale
    rotation: jnp.ndarray  # (C, 6) 6D rotation
    feature_dc: jnp.ndarray  # (C, 1, 3) SH band 0
    feature_rest: jnp.ndarray  # (C, (max_deg+1)^2-1, 3)
    opacity: jnp.ndarray  # (C, 1) logit


@flax.struct.dataclass
class SceneAux:
    """Non-optimized scene state."""

    live: jnp.ndarray  # (C,) bool
    radius_max: jnp.ndarray  # (C,) max screen radius seen (prune signal)
    xyz_grad_accum: jnp.ndarray  # (C,) accumulated |d mean2d| (densify signal)
    track_cnt: jnp.ndarray  # (C,) number of accumulations
    active_sh_degree: jnp.ndarray  # () float
    cam_dist_trans: jnp.ndarray  # (3,) scene camera centroid
    cam_dist_radius: jnp.ndarray  # () scene camera spread radius


class SceneState(NamedTuple):
    params: SceneParams
    aux: SceneAux

    @property
    def capacity(self) -> int:
        return self.params.mean.shape[0]

    @property
    def num_live(self) -> jnp.ndarray:
        return jnp.sum(self.aux.live.astype(jnp.int32))


def init_from_point_cloud(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    cam_dist_trans: jnp.ndarray,
    cam_dist_radius: jnp.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
) -> SceneState:
    """3DGS initialization from a COLMAP point cloud (reference
    module.py:80-121): log-scale from mean 3-NN distance, identity rotation,
    SH DC from RGB, opacity logit of 0.1."""
    n = xyz.shape[0]
    assert n <= capacity, f"point cloud {n} exceeds capacity {capacity}"
    C = capacity

    d2 = mean_knn_dist_sq(xyz, k=4)
    scale = jnp.log(jnp.sqrt(d2))[:, None].repeat(3, axis=1)
    rot6d = jnp.tile(
        matrix_to_rotation_6d(jnp.eye(3, dtype=jnp.float32)), (n, 1)
    )
    bands = (max_sh_degree + 1) ** 2
    f_dc = rgb_to_sh(rgb)[:, None, :]
    f_rest = jnp.zeros((n, bands - 1, 3))
    op = jnp.full((n, 1), jnp.log(0.1 / 0.9))

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((C - n,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    # dead rows hold identity 6D rotations: zero rows are a degenerate
    # Gram-Schmidt input whose backward would emit NaNs
    ident6 = jnp.tile(matrix_to_rotation_6d(jnp.eye(3, dtype=jnp.float32)), (C - n, 1))
    params = SceneParams(
        mean=pad(xyz.astype(jnp.float32)),
        scale=pad(scale),
        rotation=jnp.concatenate([rot6d, ident6], axis=0),
        feature_dc=pad(f_dc),
        feature_rest=pad(f_rest),
        opacity=pad(op),
    )
    live = jnp.arange(C) < n
    aux = SceneAux(
        live=live,
        radius_max=jnp.zeros((C,)),
        xyz_grad_accum=jnp.zeros((C,)),
        track_cnt=jnp.zeros((C,)),
        active_sh_degree=jnp.zeros(()),
        cam_dist_trans=cam_dist_trans.astype(jnp.float32),
        cam_dist_radius=jnp.asarray(cam_dist_radius, jnp.float32),
    )
    return SceneState(params, aux)


def init_empty(capacity: int, max_sh_degree: int = 3) -> SceneState:
    """Zero state of a given capacity (checkpoint-restore target; reference
    init_from_point_num, module.py:124-146)."""
    C = capacity
    bands = (max_sh_degree + 1) ** 2
    params = SceneParams(
        mean=jnp.zeros((C, 3)),
        scale=jnp.zeros((C, 3)),
        rotation=jnp.zeros((C, 6)),
        feature_dc=jnp.zeros((C, 1, 3)),
        feature_rest=jnp.zeros((C, bands - 1, 3)),
        opacity=jnp.zeros((C, 1)),
    )
    aux = SceneAux(
        live=jnp.zeros((C,), bool),
        radius_max=jnp.zeros((C,)),
        xyz_grad_accum=jnp.zeros((C,)),
        track_cnt=jnp.zeros((C,)),
        active_sh_degree=jnp.zeros(()),
        cam_dist_trans=jnp.zeros((3,)),
        cam_dist_radius=jnp.zeros(()),
    )
    return SceneState(params, aux)


def scene_assets(state: SceneState, cam_R: jnp.ndarray, cam_t: jnp.ndarray) -> GaussianAssets:
    """Decode parameters to render-ready assets with view-dependent SH color
    (reference SceneGaussian.forward, module.py:253-272)."""
    p = state.params
    mean_3d = p.mean
    opacity = jax.nn.sigmoid(p.opacity)
    scale = jnp.exp(p.scale)
    rotation = matrix_to_quaternion(rotation_6d_to_matrix(p.rotation))
    sh = jnp.concatenate([p.feature_dc, p.feature_rest], axis=1)  # (C, B, 3)

    cam_pos = -cam_R.T @ cam_t
    diff = mean_3d - cam_pos[None, :]
    # double-where: a Gaussian exactly at the camera center (e.g. a dead
    # zero row) must not poison the backward pass of the norm
    degen = jnp.sum(diff * diff, axis=1, keepdims=True) < 1e-20
    safe = jnp.where(degen, jnp.array([0.0, 0.0, 1.0]), diff)
    view_dir = safe / jnp.linalg.norm(safe, axis=1, keepdims=True)
    rgb = eval_sh_dynamic(
        state.aux.active_sh_degree, sh.transpose(0, 2, 1), view_dir
    )
    rgb = jnp.maximum(rgb + 0.5, 0.0)
    return GaussianAssets(
        mean_3d=mean_3d,
        opacity=opacity,
        scale=scale,
        rotation=rotation,
        rgb=rgb,
        live=state.aux.live,
    )


def set_sh_degree(state: SceneState, itr: int, cfg: AvatarConfig) -> SceneState:
    deg = jnp.minimum(itr // cfg.increase_sh_degree_interval, cfg.max_sh_degree)
    return state._replace(
        aux=state.aux.replace(active_sh_degree=jnp.asarray(deg, jnp.float32))
    )


def track_stats(
    state: SceneState,
    mean2d_grad: jnp.ndarray,  # (C, 2) gradient of screen-space mean, PIXEL units
    is_vis: jnp.ndarray,  # (C,) bool
    radius: jnp.ndarray,  # (C,) screen radius
    img_shape=None,  # (H, W): scale pixel-unit grads to the CUDA NDC units
) -> SceneState:
    """Accumulate densification statistics (reference module.py:155-157 and
    model.py:282-285): running max radius + mean2d gradient norms.

    Unit parity: the reference's ``densify_grad_thr = 2e-4`` thresholds the
    CUDA rasterizer's ``means2D`` gradients, which arrive in NDC units
    (dL/d ndc = dL/d pixel · W/2 — 3DGS screenspace convention). Our
    ``mean2d_offset`` is in PIXELS, so without ``img_shape`` the
    accumulated norms are ~W/2 smaller than what the reference threshold
    expects and densification silently never fires at high resolution
    (caught at 1088×1920: zero clone/split events across a full recipe
    run). Pass the rendered frame's (H, W) to restore the CUDA units."""
    aux = state.aux
    g2 = mean2d_grad[:, :2]
    if img_shape is not None:
        H, W = img_shape
        g2 = g2 * jnp.asarray([0.5 * float(W), 0.5 * float(H)])[None, :]
    g = jnp.linalg.norm(g2, axis=1)
    upd = is_vis & aux.live
    return state._replace(
        aux=aux.replace(
            radius_max=jnp.where(upd, jnp.maximum(aux.radius_max, radius), aux.radius_max),
            xyz_grad_accum=aux.xyz_grad_accum + jnp.where(upd, g, 0.0),
            track_cnt=aux.track_cnt + upd.astype(jnp.float32),
        )
    )


def _alloc_slots(free: jnp.ndarray, want: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign the i-th requested row to the i-th free slot.

    free: (C,) bool of allocatable slots; want: (M,) bool requests.
    Returns (slot_idx (M,) int32 with C for unallocated, n_dropped)."""
    C = free.shape[0]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank of each free slot
    # position of k-th free slot: scatter slot index by rank
    slot_of_rank = jnp.full((C + 1,), C, jnp.int32)
    slot_of_rank = slot_of_rank.at[jnp.where(free, free_rank, C)].set(
        jnp.arange(C, dtype=jnp.int32), mode="drop"
    )
    want_rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    ok = want & (want_rank < n_free)
    slots = jnp.where(ok, slot_of_rank[jnp.clip(want_rank, 0, C)], C)
    dropped = jnp.sum((want & ~ok).astype(jnp.int32))
    return slots.astype(jnp.int32), dropped


def _write_rows(params: SceneParams, src_idx: jnp.ndarray, dst_slots: jnp.ndarray,
                mean_new: Optional[jnp.ndarray] = None,
                scale_new: Optional[jnp.ndarray] = None) -> SceneParams:
    """Copy rows src_idx -> dst_slots (C = dropped), optionally overriding
    mean/scale (the split case)."""
    def put(buf, override=None):
        rows = buf[src_idx] if override is None else override
        return buf.at[dst_slots].set(rows, mode="drop")

    return SceneParams(
        mean=put(params.mean, mean_new),
        scale=put(params.scale, scale_new),
        rotation=put(params.rotation),
        feature_dc=put(params.feature_dc),
        feature_rest=put(params.feature_rest),
        opacity=put(params.opacity),
    )


class DensifyResult(NamedTuple):
    state: SceneState
    reset_mask: jnp.ndarray  # (C,) rows whose optax moments must be zeroed
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # densify requests dropped for lack of capacity


def densify_and_prune(
    state: SceneState,
    key: jax.Array,
    cfg: AvatarConfig,
    use_screen_size_prune: bool,
    screen_size_max: float = 20.0,
    split_factor: int = 2,
) -> DensifyResult:
    """Clone/split/prune pass at fixed capacity.

    Reference semantics (module.py:159-251): points with mean screen-space
    gradient >= ``densify_grad_thr`` are cloned (if small: max scale <=
    dense_percent_thr * cam radius) or split into ``split_factor`` resampled
    points at scale/1.6 (if large; original dies). Then prune: opacity <
    opacity_min, or (when enabled) screen radius > ``screen_size_max`` or
    world scale > 0.1 * cam radius. Stats buffers reset to zero afterwards
    (reference resets on every densify, module.py:225-227).
    """
    p, aux = state.params, state.aux
    C = p.mean.shape[0]
    grad = jnp.where(aux.track_cnt > 0, aux.xyz_grad_accum / jnp.maximum(aux.track_cnt, 1.0), 0.0)
    maxscale = jnp.max(jnp.exp(p.scale), axis=1)
    thr_scale = cfg.dense_percent_thr * aux.cam_dist_radius

    hot = aux.live & (grad >= cfg.densify_grad_thr)
    clone_mask = hot & (maxscale <= thr_scale)
    split_mask = hot & (maxscale > thr_scale)

    # --- prune originals: low opacity / too big / split sources -------------
    do_prune = aux.live & (jax.nn.sigmoid(p.opacity[:, 0]) < cfg.opacity_min)
    if use_screen_size_prune:
        big_vs = aux.radius_max > screen_size_max
        big_ws = maxscale > 0.1 * aux.cam_dist_radius
        do_prune = do_prune | (aux.live & (big_vs | big_ws))
    n_pruned = jnp.sum(do_prune.astype(jnp.int32))
    live = aux.live & ~do_prune & ~split_mask

    # --- allocate free slots for clones + split children --------------------
    # requests laid out as [clone copies | split children x split_factor]
    free = ~live
    idx = jnp.arange(C, dtype=jnp.int32)
    want = jnp.concatenate([clone_mask] + [split_mask] * split_factor)
    src = jnp.concatenate([idx] * (1 + split_factor))
    slots, n_dropped = _alloc_slots(free, want)

    # split children: resample positions from the Gaussian, shrink scale
    sigma = jnp.exp(p.scale)  # (C, 3)
    R = rotation_6d_to_matrix(p.rotation)  # (C, 3, 3)
    eps = jax.random.normal(key, (split_factor, C, 3))
    child_means = jnp.einsum("cij,kcj->kci", R, eps * sigma[None]) + p.mean[None]
    child_scale = jnp.log(sigma / (0.8 * split_factor))

    mean_rows = jnp.concatenate([p.mean] + [child_means[k] for k in range(split_factor)])
    scale_rows = jnp.concatenate([p.scale] + [child_scale] * split_factor)

    new_params = _write_rows(p, src, slots, mean_rows, scale_rows)
    # rows written this round (the scatter wrote src rows at `slots`)
    written = jnp.zeros((C,), bool).at[slots].set(want, mode="drop")
    live = live | written

    # moments of new rows and freed rows start from zero
    reset_mask = written | do_prune | split_mask

    aux = aux.replace(
        live=live,
        radius_max=jnp.zeros((C,)),
        xyz_grad_accum=jnp.zeros((C,)),
        track_cnt=jnp.zeros((C,)),
    )
    return DensifyResult(
        state=SceneState(new_params, aux),
        reset_mask=reset_mask,
        n_cloned=jnp.sum(clone_mask.astype(jnp.int32)),
        n_split=jnp.sum(split_mask.astype(jnp.int32)),
        n_pruned=n_pruned,
        n_dropped=n_dropped,
    )


def reset_opacity(state: SceneState) -> Tuple[SceneState, jnp.ndarray]:
    """Clamp opacity to <= 0.01 (reference module.py:246-251). Returns the
    new state and the reset mask for the opacity optax moments."""
    p = state.params
    op = jnp.minimum(jax.nn.sigmoid(p.opacity), 0.01)
    logit = jnp.log(op / (1.0 - op))
    return (
        state._replace(params=p.replace(opacity=logit)),
        jnp.ones((p.opacity.shape[0],), bool),
    )
