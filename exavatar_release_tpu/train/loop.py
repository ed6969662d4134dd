"""Jitted train step + host-side densification cadence.

The reference iterates: forward -> backward -> adjust_gaussians (mutating
the optimizer) -> step (reference avatar/main/train.py:28-74). Here the
whole gradient step is ONE jitted pure function; the screen-space mean
gradient that densification needs is obtained as d(loss)/d(mean2d_offset)
of an explicit zero offset input (replacing the retained-grad leaf hack at
module.py:626-629). Densify/prune runs as a separate jitted function on the
reference cadence (every ``densify_interval`` itrs in
[densify_start_itr, densify_end_itr), opacity reset every
``opacity_reset_interval``) and zeroes the affected Adam moments.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..avatar import scene as sc
from ..avatar.config import AvatarConfig
from ..avatar.human import HumanBuffers
from ..avatar.model import (
    AvatarStatics,
    AvatarTrainables,
    ForwardOutputs,
    FrameData,
    forward_frame,
    total_loss,
)
from ..models.smplx.prior import SMPLXIDInfo, SMPLXPrior
from ..ops.lpips import LPIPSParams
from ..ops.rasterizer.api import RasterizeSettings
from .optim import make_optimizer, zero_opacity_moments, zero_scene_moments


class TrainState(NamedTuple):
    trainables: AvatarTrainables
    opt_state: Any
    scene_aux: sc.SceneAux
    itr: jnp.ndarray  # () int32


class ModelBundle(NamedTuple):
    """Everything static-ish the step needs besides the train state."""

    buffers: HumanBuffers
    prior: SMPLXPrior
    statics: AvatarStatics
    id_info: SMPLXIDInfo
    lpips: LPIPSParams
    face_texture: jnp.ndarray
    face_texture_mask: jnp.ndarray
    init_joint_offset: jnp.ndarray


def init_train_state(
    trainables: AvatarTrainables,
    scene_aux: sc.SceneAux,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    return TrainState(
        trainables=trainables,
        opt_state=optimizer.init(trainables),
        scene_aux=scene_aux,
        itr=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("optimizer", "cfg", "is_warmup", "fit_pose_to_test", "settings"),
)
def train_step(
    state: TrainState,
    bundle: ModelBundle,
    frame: FrameData,
    key: jax.Array,
    optimizer: optax.GradientTransformation,
    cfg: AvatarConfig,
    is_warmup: bool,
    fit_pose_to_test: bool = False,
    settings: RasterizeSettings = RasterizeSettings(),
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step on one frame. Returns (state, loss dict)."""
    C = state.trainables.scene.mean.shape[0]
    bg = jax.random.uniform(key, (3,))
    m2d_zero = jnp.zeros((C, 2))

    def loss_fn(trainables, m2d_offset):
        out = forward_frame(
            trainables, state.scene_aux, bundle.buffers, bundle.prior,
            bundle.statics, bundle.id_info, bundle.lpips, bundle.face_texture,
            bundle.face_texture_mask, bundle.init_joint_offset, frame, bg,
            cfg, is_warmup=is_warmup, mode="train",
            fit_pose_to_test=fit_pose_to_test, settings=settings,
            scene_mean2d_offset=m2d_offset,
        )
        return total_loss(out.losses), out

    (tot, out), (g_tr, g_m2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.trainables, m2d_zero)

    updates, opt_state = optimizer.update(g_tr, state.opt_state, state.trainables)
    trainables = optax.apply_updates(state.trainables, updates)

    # densification statistics from the scene render (reference
    # train.py:49-54 + model.py:279-292)
    scene_state = sc.SceneState(state.trainables.scene, state.scene_aux)
    scene_state = sc.track_stats(
        scene_state, g_m2d, out.scene_is_vis, out.scene_radius,
        img_shape=(int(frame.img.shape[1]), int(frame.img.shape[2])),
    )
    aux = scene_state.aux.replace(
        active_sh_degree=jnp.minimum(
            state.itr // cfg.increase_sh_degree_interval, cfg.max_sh_degree
        ).astype(jnp.float32)
    )

    losses = dict(out.losses)
    losses["total"] = tot
    # diagnostics, not loss terms (total above excludes them): pairs lost to
    # static binning capacities this step — the CLI logs them every
    # iteration and RasterCapacityGovernor grows the matching capacity
    losses["raster_dropped"] = jnp.asarray(out.raster_dropped, jnp.float32)
    losses["raster_dropped_pairs"] = jnp.asarray(
        out.raster_dropped_pairs, jnp.float32
    )
    losses["raster_truncated"] = jnp.asarray(out.raster_truncated, jnp.float32)
    losses["raster_exchange_overflow"] = jnp.asarray(
        out.raster_exchange_overflow, jnp.float32
    )
    return (
        TrainState(
            trainables=trainables,
            opt_state=opt_state,
            scene_aux=aux,
            itr=state.itr + 1,
        ),
        losses,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "use_screen_size_prune", "optimizer")
)
def densify_step(
    state: TrainState,
    key: jax.Array,
    cfg: AvatarConfig,
    use_screen_size_prune: bool,
    optimizer: optax.GradientTransformation = None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Densify/prune + Adam-moment surgery (reference adjust_gaussians,
    model.py:279-292). Pass ``optimizer`` for structural slot surgery that
    survives any transform chain."""
    scene_state = sc.SceneState(state.trainables.scene, state.scene_aux)
    res = sc.densify_and_prune(scene_state, key, cfg, use_screen_size_prune)
    opt_state = zero_scene_moments(
        state.opt_state, res.reset_mask, optimizer, state.trainables
    )
    stats = {
        "n_cloned": res.n_cloned,
        "n_split": res.n_split,
        "n_pruned": res.n_pruned,
        "n_dropped": res.n_dropped,
        "n_live": jnp.sum(res.state.aux.live.astype(jnp.int32)),
    }
    return (
        state._replace(
            trainables=state.trainables.replace(scene=res.state.params),
            opt_state=opt_state,
            scene_aux=res.state.aux,
        ),
        stats,
    )


@functools.partial(jax.jit, static_argnames=("optimizer",))
def opacity_reset_step(
    state: TrainState, optimizer: optax.GradientTransformation = None
) -> TrainState:
    scene_state = sc.SceneState(state.trainables.scene, state.scene_aux)
    new_scene, _ = sc.reset_opacity(scene_state)
    return state._replace(
        trainables=state.trainables.replace(scene=new_scene.params),
        opt_state=zero_opacity_moments(
            state.opt_state, optimizer, state.trainables
        ),
    )


def maybe_adjust_gaussians(
    state: TrainState,
    key: jax.Array,
    cur_itr: int,
    cfg: AvatarConfig,
    fit_pose_to_test: bool = False,
    optimizer: optax.GradientTransformation = None,
) -> Tuple[TrainState, Optional[Dict[str, jnp.ndarray]]]:
    """Host-side cadence control (reference train.py:49-54 +
    model.py:287-292): densify every ``densify_interval`` in
    (densify_start_itr, densify_end_itr); opacity reset every
    ``opacity_reset_interval``."""
    if fit_pose_to_test or cur_itr >= cfg.densify_end_itr:
        return state, None
    stats = None
    if cur_itr > cfg.densify_start_itr and cur_itr % cfg.densify_interval == 0:
        use_screen_prune = cur_itr > cfg.opacity_reset_interval
        state, stats = densify_step(state, key, cfg, use_screen_prune, optimizer)
    if cur_itr > 0 and cur_itr % cfg.opacity_reset_interval == 0:
        state = opacity_reset_step(state, optimizer)
    return state, stats


class RasterCapacityGovernor:
    """Host-side auto-growth of the rasterizer's static binning capacities
    (round-3 verdict item: truncation silently crops footprints AND zeroes
    the cropped Gaussians' gradients — a training-divergence trigger during
    warmup, when random-init nets emit huge footprints).

    Feed it each step's ``raster_dropped_pairs`` / ``raster_truncated``
    diagnostics; after ``patience`` consecutive steps with drops it returns
    a grown ``RasterizeSettings`` (pair budget x2 on pair drops, per-tile
    cap x2 on truncation). Growth recompiles the step — O(log) events,
    same contract as ``grow_scene_capacity``. The reference has no
    equivalent: its CUDA rasterizer allocates dynamically per frame.
    """

    def __init__(self, settings: RasterizeSettings, patience: int = 3,
                 max_pairs_ceiling: int = 1 << 24,
                 max_per_tile_ceiling: int = 1 << 14, log=None,
                 exchange_cap_floor: int = 512,
                 pair_major_threshold: int = 4096):
        self.settings = settings
        self.patience = patience
        self.max_pairs_ceiling = max_pairs_ceiling
        self.max_per_tile_ceiling = max_per_tile_ceiling
        # when settings.exchange_cap <= 0 (auto) the rasterizer resolves it
        # to 4·ceil(N/D²) (parallel.sharded_raster.resolve_exchange_cap);
        # growth must seed FROM that resolved value — callers using
        # gaussian_shard should pass resolve_exchange_cap(N_max, D) here so
        # the first growth never replaces a large auto cap with a smaller
        # explicit one (which would worsen the very overflow it heals)
        self.exchange_cap_floor = exchange_cap_floor
        self.pair_major_threshold = pair_major_threshold
        self._pair_streak = 0
        self._trunc_streak = 0
        self._xovf_streak = 0
        self._log = log or (lambda msg: None)

    def update(self, dropped_pairs: float, truncated: float,
               exchange_overflow: float = 0.0) -> RasterizeSettings:
        """Record one step's drop counters; returns the (possibly grown)
        settings to use from the next step on."""
        import dataclasses as _dc

        s = self.settings
        self._pair_streak = self._pair_streak + 1 if dropped_pairs > 0 else 0
        self._trunc_streak = self._trunc_streak + 1 if truncated > 0 else 0
        self._xovf_streak = (
            self._xovf_streak + 1 if exchange_overflow > 0 else 0
        )
        if self._xovf_streak >= self.patience:
            self._xovf_streak = 0
            # exchange_cap <= 0 means auto (4·ceil(N/D²)); seed the explicit
            # growth from the caller-resolved auto cap so doubling never
            # SHRINKS capacity below what the auto path already provided
            base = (s.exchange_cap if s.exchange_cap > 0
                    else max(512, self.exchange_cap_floor))
            new = min(base * 2, self.max_pairs_ceiling)
            if new != s.exchange_cap:
                self._log(f"raster exchange_cap {s.exchange_cap} -> {new} "
                          f"(sustained exchange_overflow="
                          f"{exchange_overflow:.0f})")
                s = _dc.replace(s, exchange_cap=new)
        if self._pair_streak >= self.patience:
            self._pair_streak = 0
            if s.max_pairs > 0:
                new = min(s.max_pairs * 2, self.max_pairs_ceiling)
                if new != s.max_pairs:
                    self._log(f"raster pair budget {s.max_pairs} -> {new} "
                              f"(sustained n_dropped_pairs={dropped_pairs:.0f})")
                    s = _dc.replace(s, max_pairs=new)
            else:
                new = min(s.pairs_per_gaussian * 2,
                          max(1, self.max_pairs_ceiling // 1024))
                if new != s.pairs_per_gaussian:
                    self._log(f"raster pairs_per_gaussian "
                              f"{s.pairs_per_gaussian} -> {new} "
                              f"(sustained n_dropped_pairs={dropped_pairs:.0f})")
                    s = _dc.replace(s, pairs_per_gaussian=new)
        if self._trunc_streak >= self.patience:
            self._trunc_streak = 0
            new = min(s.max_per_tile * 2, self.max_per_tile_ceiling)
            if (not s.pair_major and s.backend != "ref"
                    and new > self.pair_major_threshold):
                # dense (T, 12, K) windows past this K spend most of their
                # HBM traffic on empty slots (measured 2.42 s/itr at the
                # zero-truncation K=16384 vs ~1 s truncating at 1024,
                # tools/train_step_bench.py --steady) — switch the render
                # to the ragged pair-major path, where per-tile capacity
                # (and truncation itself) does not exist
                self._log(f"raster max_per_tile pressure past "
                          f"{self.pair_major_threshold}: switching to "
                          f"pair_major (ragged) compositing "
                          f"(sustained n_truncated={truncated:.0f})")
                s = _dc.replace(s, pair_major=True)
            elif new != s.max_per_tile:
                self._log(f"raster max_per_tile {s.max_per_tile} -> {new} "
                          f"(sustained n_truncated={truncated:.0f})")
                s = _dc.replace(s, max_per_tile=new)
        self.settings = s
        return s


def grow_scene_capacity(
    state: TrainState, new_capacity: int,
    optimizer: "optax.GradientTransformation" = None,
) -> TrainState:
    """Host-side capacity reallocation when densification keeps dropping
    requests (n_dropped > 0): pad the scene parameter rows, aux buffers, and
    every param-shaped optimizer slot to ``new_capacity``. Recompiles
    downstream jits once per growth (growth is O(log) events over training).
    The reference instead reallocates tensors every densify step
    (module.py:17-72).

    When ``optimizer`` is given, the opt state is padded structurally via
    ``optax.tree_map_params`` — robust to any transform chain. Without it,
    the state must be the default ``(adam_state, lr_state)`` pair."""
    import numpy as _np

    from ..core.rotations import matrix_to_rotation_6d

    C_old = state.trainables.scene.mean.shape[0]
    assert new_capacity >= C_old
    pad_n = new_capacity - C_old
    if pad_n == 0:
        return state

    ident6 = jnp.tile(
        matrix_to_rotation_6d(jnp.eye(3, dtype=jnp.float32)), (pad_n, 1)
    )

    def pad_params(p: sc.SceneParams) -> sc.SceneParams:
        z = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad_n,) + x.shape[1:], x.dtype)], axis=0
        )
        return sc.SceneParams(
            mean=z(p.mean), scale=z(p.scale),
            rotation=jnp.concatenate([p.rotation, ident6], axis=0),
            feature_dc=z(p.feature_dc), feature_rest=z(p.feature_rest),
            opacity=z(p.opacity),
        )

    def pad_rows(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad_n,) + x.shape[1:], x.dtype)], axis=0
        )

    aux = state.scene_aux
    new_aux = aux.replace(
        live=jnp.concatenate([aux.live, jnp.zeros((pad_n,), bool)]),
        radius_max=pad_rows(aux.radius_max),
        xyz_grad_accum=pad_rows(aux.xyz_grad_accum),
        track_cnt=pad_rows(aux.track_cnt),
    )

    if optimizer is not None:
        import optax as _optax

        # mask tree shaped like the params: True on scene leaves only
        mask = jax.tree.map(lambda _: False, state.trainables)
        mask = mask.replace(
            scene=jax.tree.map(lambda _: True, state.trainables.scene)
        )
        def pad_slot(slot, is_scene):
            # some transforms keep scalar per-param state (e.g. zero_nans'
            # found_nan flags) — only row-shaped slots get padded
            if (is_scene and getattr(slot, "ndim", 0) >= 1
                    and slot.shape[0] == C_old):
                return pad_rows(slot)
            return slot

        new_opt_state = _optax.tree_map_params(
            optimizer, pad_slot, state.opt_state, mask
        )
    else:
        adam_state, lr_state = state.opt_state

        def pad_moments(tree):
            return tree.replace(scene=jax.tree.map(pad_rows, tree.scene))

        new_adam = adam_state._replace(
            mu=pad_moments(adam_state.mu), nu=pad_moments(adam_state.nu)
        )
        new_opt_state = (new_adam, lr_state)
    return state._replace(
        trainables=state.trainables.replace(
            scene=pad_params(state.trainables.scene)
        ),
        opt_state=new_opt_state,
        scene_aux=new_aux,
    )
