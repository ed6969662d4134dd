"""Full train-step timing at realistic avatar scale on the current backend.

Measures ONE jitted ``train.loop.train_step`` — 5 Gaussian renders + 2 mesh
renders + LBS + ~20 loss terms + optimizer update (reference telemetry:
avatar/main/train.py:61-68 logs total/gpu s-per-itr; no values are committed
upstream, so this records OUR number) — on a synthetic subject with the real
model's scale:

* SMPL-X V ~ 10.4k -> V_hr ~ 166k human Gaussians (2x subdivision, matching
  the reference's vertex_num_upsampled ~= 167k, smpl_x.py:52-54);
* a configurable scene-Gaussian count on top (NeuMan COLMAP sparse scenes
  land in the tens of thousands);
* 1080p (1920x1080) frames, triplane 32ch/128res (reference config.py:8-10).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/train_step_bench.py
"""
import argparse
import sys
import time
from os import path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_setup(H, W, rings, segs, scene_capacity, scene_live, triplane_res):
    from exavatar_release_tpu.avatar import scene as sc
    from exavatar_release_tpu.avatar.config import AvatarConfig
    from exavatar_release_tpu.avatar.human import init_human
    from exavatar_release_tpu.avatar.model import (
        AvatarTrainables,
        FrameData,
        build_statics,
    )
    from exavatar_release_tpu.avatar.param_dict import init_param_frames
    from exavatar_release_tpu.core.camera import Camera
    from exavatar_release_tpu.models.smplx import (
        SMPLXIDInfo,
        build_prior,
        synthetic_smplx_assets,
    )
    from exavatar_release_tpu.ops.lpips import init_lpips_random

    rng = np.random.default_rng(0)
    cfg = AvatarConfig(triplane_res=triplane_res, scene_capacity=scene_capacity)
    prior = build_prior(
        synthetic_smplx_assets(rings=rings, segs=segs, num_shape=16, num_expr=50)
    )
    a = prior.assets
    print(
        f"V={a.num_vertices} V_hr={prior.vertex_num_upsampled} "
        f"(reference: 10475 -> ~167k, smpl_x.py:52-54)"
    )
    id_info = SMPLXIDInfo.zeros(a.num_shape, a.num_vertices, a.num_joints)
    human_params, buffers = init_human(jax.random.PRNGKey(0), prior, id_info, cfg)

    fv = np.asarray(prior.face_vertex_idx)
    faces = np.asarray(prior.assets.faces)
    inv = -np.ones(a.num_vertices, np.int64)
    inv[fv] = np.arange(fv.size)
    inside = (inv[faces] >= 0).all(axis=1)
    face_faces = inv[faces[inside]].astype(np.int32)
    if face_faces.size == 0:
        face_faces = np.zeros((1, 3), np.int32)
    pts = np.asarray(a.v_template)[fv]
    lo, hi = pts.min(0), pts.max(0)
    uv = ((pts[:, :2] - lo[:2]) / np.maximum(hi[:2] - lo[:2], 1e-6)).astype(
        np.float32
    )
    statics = build_statics(prior, buffers, face_faces, uv, face_faces)

    # scene points scattered around + behind the subject (a real COLMAP
    # cloud), z-filtered like data/subject.py would
    pts3 = np.stack(
        [
            rng.uniform(-6, 6, scene_live),
            rng.uniform(-3, 4, scene_live),
            rng.uniform(2.0, 10.0, scene_live),
        ],
        1,
    ).astype(np.float32)
    rgbs = rng.uniform(0, 1, (scene_live, 3)).astype(np.float32)
    scene_state = sc.init_from_point_cloud(
        jnp.asarray(pts3), jnp.asarray(rgbs), jnp.zeros(3), jnp.asarray(6.0),
        cfg.scene_capacity,
    )

    frames_params = [
        {
            "root_pose": np.asarray([np.pi, 0, 0]),
            "body_pose": rng.normal(0, 0.1, (21, 3)),
            "jaw_pose": np.zeros(3),
            "leye_pose": np.zeros(3),
            "reye_pose": np.zeros(3),
            "lhand_pose": np.zeros((15, 3)),
            "rhand_pose": np.zeros((15, 3)),
            "expr": np.zeros(a.num_expr),
            "trans": np.asarray([0.0, 0.1, 2.5]),
        }
        for _ in range(4)
    ]
    trainables = AvatarTrainables(
        scene=scene_state.params,
        human=human_params,
        frames=init_param_frames(frames_params),
    )
    from exavatar_release_tpu.train.loop import ModelBundle

    bundle = ModelBundle(
        buffers=buffers,
        prior=prior,
        statics=statics,
        id_info=id_info,
        lpips=init_lpips_random(jax.random.PRNGKey(1), "vgg"),
        face_texture=jnp.asarray(
            rng.uniform(0, 1, (3, 256, 256)).astype(np.float32)
        ),
        face_texture_mask=jnp.ones((1, 256, 256)),
        init_joint_offset=jnp.zeros((a.num_joints, 3)),
    )
    img = rng.uniform(0, 1, (3, H, W)).astype(np.float32)
    mask = np.zeros((1, H, W), np.float32)
    mask[:, H // 6 : 5 * H // 6, W // 3 : 2 * W // 3] = 1.0
    frame = FrameData(
        img=jnp.asarray(img),
        mask=jnp.asarray(mask),
        bbox=jnp.asarray([W * 0.33, H * 0.16, W * 0.33, H * 0.68]),
        cam=Camera(
            R=jnp.eye(3),
            t=jnp.zeros(3),
            focal=jnp.asarray([1200.0, 1200.0]),
            princpt=jnp.asarray([W / 2.0, H / 2.0]),
        ),
        frame_row=jnp.asarray(0),
    )
    return cfg, trainables, scene_state, bundle, frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--rings", type=int, default=80)
    ap.add_argument("--segs", type=int, default=130)
    ap.add_argument("--scene_capacity", type=int, default=1 << 15)
    ap.add_argument("--scene_live", type=int, default=20000)
    ap.add_argument("--triplane_res", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--warmup_mode", action="store_true",
                    help="time the is_warmup=True step instead")
    ap.add_argument("--profile_dir", default="",
                    help="write a jax.profiler trace of 2 steps here")
    ap.add_argument("--breakdown", action="store_true",
                    help="also time the step's components in isolation "
                         "(human fwd+bwd, each render, face renders, "
                         "losses, optimizer)")
    ap.add_argument("--pair_major", action="store_true",
                    help="use the ragged pair-major compositing path")
    ap.add_argument("--chunk", type=int, default=0,
                    help="compositing chunk override (0 = default 256)")
    ap.add_argument("--sub_bwd", type=int, default=0,
                    help="composite_sub_bwd override (0 = default 4)")
    ap.add_argument("--ppg", type=int, default=0,
                    help="pairs_per_gaussian budget override (0 = default "
                         "16; every per-pair op scales with it — a snug "
                         "budget cuts ragged plumbing, drops auto-grow it "
                         "back)")
    ap.add_argument("--steady", action="store_true",
                    help="start from a plausible converged-scale state "
                         "(scale head at log 0.01) and auto-grow binning "
                         "capacities to zero drops before timing")
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    from exavatar_release_tpu.ops.rasterizer.api import RasterizeSettings
    from exavatar_release_tpu.train.loop import init_train_state, train_step
    from exavatar_release_tpu.train.optim import make_optimizer

    t0 = time.perf_counter()
    cfg, trainables, scene_state, bundle, frame = build_setup(
        args.h, args.w, args.rings, args.segs, args.scene_capacity,
        args.scene_live, args.triplane_res,
    )
    print(f"setup: {time.perf_counter() - t0:.1f}s")
    over = {}
    if args.ppg > 0:
        over["pairs_per_gaussian"] = args.ppg
    if args.chunk > 0:
        over["chunk"] = args.chunk
    if args.sub_bwd > 0:
        over["composite_sub_bwd"] = args.sub_bwd
    settings = RasterizeSettings(
        backend=args.backend, pair_major=args.pair_major, **over
    )
    if args.steady:
        # training steady state, not step 0: converged runs live at small
        # scales with ZERO dropped pairs (the governor drives drops to 0 and
        # every drop also skips compositing work, so a dropping config times
        # an unrealistically light step). Scale head -> log(0.01) like
        # tools/convergence_demo.py, then grow capacities until no drops.
        sn = trainables.human.scale_net
        nb = len(sn.biases)
        sn = sn._replace(biases=tuple(
            jnp.full_like(b, float(np.log(0.01))) if i == nb - 1 else b
            for i, b in enumerate(sn.biases)
        ))
        trainables = trainables.replace(
            human=trainables.human.replace(scale_net=sn)
        )
    opt = make_optimizer(trainables, cfg, 6.0, tot_itr=30000)
    state = init_train_state(trainables, scene_state.aux, opt)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, losses = train_step(
        state, bundle, frame, key, opt, cfg,
        is_warmup=args.warmup_mode, settings=settings,
    )
    jax.block_until_ready(losses["total"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(loss={float(losses['total']):.4f}, "
          f"dropped={int(losses['raster_dropped'])})")

    if args.steady:
        # grow capacities to the zero-drop steady state (each growth
        # recompiles once, like real training's O(log) governor events)
        from exavatar_release_tpu.train.loop import RasterCapacityGovernor

        gov = RasterCapacityGovernor(settings, patience=1, log=print)
        for _ in range(5):
            if float(losses["raster_dropped"]) == 0:
                break
            settings = gov.update(
                float(losses["raster_dropped_pairs"]),
                float(losses["raster_truncated"]),
            )
            t0 = time.perf_counter()
            state, losses = train_step(
                state, bundle, frame, key, opt, cfg,
                is_warmup=args.warmup_mode, settings=settings,
            )
            jax.block_until_ready(losses["total"])
            print(f"  regrown step: {time.perf_counter() - t0:.1f}s "
                  f"(dropped={int(losses['raster_dropped'])})")
        print(f"steady state: dropped={int(losses['raster_dropped'])} "
              f"(pairs={int(losses['raster_dropped_pairs'])}, "
              f"trunc={int(losses['raster_truncated'])})")

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            for _ in range(2):
                state, losses = train_step(
                    state, bundle, frame, key, opt, cfg,
                    is_warmup=args.warmup_mode, settings=settings,
                )
            jax.block_until_ready(losses["total"])
        print(f"trace written to {args.profile_dir}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, losses = train_step(
            state, bundle, frame, key, opt, cfg,
            is_warmup=args.warmup_mode, settings=settings,
        )
    jax.block_until_ready(losses["total"])
    dt = (time.perf_counter() - t0) / args.iters
    n_total = int(bundle.prior.vertex_num_upsampled) + args.scene_capacity
    print(
        f"train_step: {dt * 1e3:.1f} ms/itr at {args.h}x{args.w}, "
        f"{n_total} Gaussians ({bundle.prior.vertex_num_upsampled} human + "
        f"{args.scene_capacity} scene capacity), backend={args.backend}"
    )
    print(f"  = {1.0 / dt:.2f} itr/s")

    if args.breakdown:
        run_breakdown(args, cfg, bundle, state, frame, settings, opt, dt)


def run_breakdown(args, cfg, bundle, state, frame, settings, opt, step_dt):
    """Time the train step's components in ISOLATION (each its own jit,
    fwd+bwd where training differentiates it). The residual vs the full
    step is losses + assembly + overheads that only exist composed."""
    from exavatar_release_tpu.avatar import scene as sc
    from exavatar_release_tpu.avatar.gaussians import concat_assets, detach_assets
    from exavatar_release_tpu.avatar.human import human_forward
    from exavatar_release_tpu.ops.rasterizer.api import rasterize

    H, W = args.h, args.w
    tr = state.trainables
    iters = max(2, args.iters // 2)

    def timeit(label, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {label:<28s} {ms:8.1f} ms")
        return ms

    print("component breakdown (isolated jits, fwd+bwd):")

    # human model: triplane sample + MLP heads + KNN skinning + LBS, and
    # its backward (training differentiates through all of it)
    def human_loss(human, frames):
        p = frames.lookup(frame.frame_row)
        hout = human_forward(
            human, bundle.buffers, bundle.prior, p, bundle.id_info,
            frame.cam.R, frame.cam.t, cfg,
        )
        return (
            jnp.sum(hout.assets.mean_3d) + jnp.sum(hout.assets.scale)
            + jnp.sum(hout.assets.rgb)
            + jnp.sum(hout.assets_refined.mean_3d)
            + jnp.sum(hout.assets_refined.scale)
            + jnp.sum(hout.assets_refined.rgb)
        )

    t_human = timeit(
        "human fwd+bwd (LBS+MLPs)",
        jax.jit(jax.grad(human_loss, argnums=(0, 1))), tr.human, tr.frames,
    )

    # materialize the render inputs once
    scene_asset = sc.scene_assets(
        sc.SceneState(tr.scene, state.scene_aux), frame.cam.R, frame.cam.t
    )
    p = tr.frames.lookup(frame.frame_row)
    hout = human_forward(
        tr.human, bundle.buffers, bundle.prior, p, bundle.id_info,
        frame.cam.R, frame.cam.t, cfg,
    )
    sets = {
        "scene": scene_asset,
        "human": hout.assets,
        "human_ref": hout.assets_refined,
        "scene+human": concat_assets(detach_assets(scene_asset), hout.assets),
        "scene+human_ref": concat_assets(
            detach_assets(scene_asset), hout.assets_refined
        ),
    }
    t_renders = 0.0
    for name, a in sets.items():
        def rloss(mean, scale, rot, opac, rgb, live=a.live):
            r = rasterize(mean, scale, rot, opac, rgb, live, frame.cam,
                          (H, W), jnp.zeros(3), settings)
            return jnp.sum(r["img"]) + jnp.sum(r["mask"]) + jnp.sum(r["depth"])

        t_renders += timeit(
            f"render {name} ({a.mean_3d.shape[0]}g)",
            jax.jit(jax.grad(rloss, argnums=(0, 1, 2, 3, 4))),
            a.mean_3d, a.scale, a.rotation, a.opacity, a.rgb,
        )

    # face mesh renders (2x in the step)
    from exavatar_release_tpu.ops.mesh_raster import render_textured_mesh

    frh = min(cfg.face_render_h, H)
    frw = min(cfg.face_render_w, W)
    uvmap = jnp.concatenate(
        [bundle.face_texture, bundle.face_texture_mask], axis=0
    )
    fv = bundle.statics.face_vertex_idx

    def floss(verts):
        patch = render_textured_mesh(
            uvmap, verts, jnp.asarray(bundle.statics.face_faces),
            frame.cam.R, frame.cam.t, frame.cam.focal, frame.cam.princpt,
            (frh, frw), jnp.asarray(bundle.statics.face_face_uv),
            jnp.asarray(bundle.statics.face_vertex_uv),
        )
        return jnp.sum(patch)

    t_face = 2 * timeit(
        f"face mesh render x2 ({frh}x{frw})",
        jax.jit(jax.grad(floss)), hout.assets.mean_3d[fv],
    )

    # optimizer update alone
    import optax

    g_fake = jax.tree.map(jnp.ones_like, tr)

    def opt_step(g, opt_state, params):
        upd, new_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), new_state

    t_opt = timeit(
        "optimizer update", jax.jit(opt_step), g_fake, state.opt_state, tr
    )

    known = t_human + t_renders + t_face + t_opt
    print(f"  {'sum of components':<28s} {known:8.1f} ms")
    print(f"  {'full step (composed)':<28s} {step_dt * 1e3:8.1f} ms")
    print(f"  {'residual (losses+glue)':<28s} "
          f"{step_dt * 1e3 - known:8.1f} ms")


if __name__ == "__main__":
    main()
