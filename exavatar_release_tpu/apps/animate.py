"""Animation CLIs (reference avatar/main/animate.py, animate_view_rot.py,
get_neutral_pose.py): drive a trained avatar with a motion directory, a
rotating camera, or render the 大-pose turntable.

python -m exavatar_release_tpu.apps.animate --subject_root ... --ckpt ...
    --motion_dir <dir of smplx_params jsons> [--view_rot]
python -m exavatar_release_tpu.apps.animate --subject_root ... --ckpt ...
    --neutral_pose  # 大-pose turntable + point cloud export
"""
from __future__ import annotations

import argparse
import json
import math
import os
import os.path as osp
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np


def _orbit_camera(center: np.ndarray, radius: float, angle: float,
                  focal, princpt):
    """Camera orbiting around a world center (reference
    animate_view_rot.py:59-119 / get_neutral_pose.py:76-87)."""
    from ..core.camera import Camera, look_at

    eye = center + radius * np.asarray(
        [math.sin(angle), 0.0, math.cos(angle)], np.float32
    )
    R, t = look_at(
        jnp.asarray(eye), jnp.asarray(center), jnp.asarray([0.0, -1.0, 0.0])
    )
    return Camera(R=R, t=t, focal=jnp.asarray(focal), princpt=jnp.asarray(princpt))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject_root", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--human_model_path", default=None)
    ap.add_argument("--motion_dir", default=None)
    ap.add_argument("--view_rot", action="store_true")
    ap.add_argument("--neutral_pose", action="store_true")
    ap.add_argument("--num_views", type=int, default=50)
    ap.add_argument("--img_size", type=int, nargs=2, default=[512, 512])
    ap.add_argument("--out_dir", default="output/animate")
    ap.add_argument("--video", action="store_true",
                    help="also write an mp4 of the rendered frames")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--scene_capacity", type=int, default=1 << 17)
    ap.add_argument("--triplane_ch", type=int, default=32)
    ap.add_argument("--triplane_res", type=int, default=128)
    ap.add_argument("--raster_backend", default="pallas", choices=["pallas", "ref"])
    ap.add_argument("--pair_major", action="store_true",
                    help="ragged pair-major compositing — the right mode at reference avatar density (no per-tile capacity, no truncation)")
    args = ap.parse_args()

    from ..avatar.config import AvatarConfig
    from ..avatar.human import human_forward, neutral_pose_human
    from ..avatar.param_dict import PosedSMPLXParams
    from ..data.subject import load_subject
    from ..ops.rasterizer.api import RasterizeSettings, rasterize
    from ..train.checkpoint import load_checkpoint
    from ..train.loop import init_train_state
    from ..train.optim import make_optimizer
    from .common import build_prior_for, face_mesh_for, subject_bundle
    from .test import save_image

    cfg = AvatarConfig(scene_capacity=args.scene_capacity,
                       triplane_ch=args.triplane_ch,
                       triplane_res=args.triplane_res)
    subject = load_subject(args.subject_root, split="train", repeat=1)
    prior = build_prior_for(args.human_model_path)
    flame_faces, vertex_uv, face_uv = face_mesh_for(args.human_model_path, prior)
    trainables, scene_state, bundle, _ = subject_bundle(
        subject, prior, cfg, flame_faces, vertex_uv, face_uv,
        lpips_quiet=True,
    )
    opt = make_optimizer(trainables, cfg, 1.0, 1)
    state = init_train_state(trainables, scene_state.aux, opt)
    state, _ = load_checkpoint(args.ckpt, state)

    os.makedirs(args.out_dir, exist_ok=True)
    H, W = args.img_size
    settings = RasterizeSettings(backend=args.raster_backend,
                                 pair_major=args.pair_major)
    E = prior.assets.num_expr

    def render_assets(assets, cam):
        r = rasterize(
            assets.mean_3d, assets.scale, assets.rotation, assets.opacity,
            assets.rgb, assets.live, cam, (H, W), jnp.ones(3), settings,
        )
        return r["img"]

    if args.neutral_pose:
        # 大-pose turntable (reference get_neutral_pose.py:53-93)
        mesh_hr, _, _, _ = neutral_pose_human(
            prior, state.trainables.human.shape_param, bundle.id_info,
            jaw_zero_pose=True,
        )
        zero = PosedSMPLXParams(
            root_pose=jnp.zeros(3),
            body_pose=prior.neutral_body_pose,
            jaw_pose=jnp.zeros(3), leye_pose=jnp.zeros(3), reye_pose=jnp.zeros(3),
            lhand_pose=jnp.zeros((15, 3)), rhand_pose=jnp.zeros((15, 3)),
            expr=jnp.zeros(E), trans=jnp.zeros(3),
        )
        hout = human_forward(
            state.trainables.human, bundle.buffers, prior, zero,
            bundle.id_info, jnp.eye(3), jnp.zeros(3), cfg, is_world_coord=True,
        )
        center = np.asarray(hout.assets.mean_3d.mean(0))
        np.savetxt(
            osp.join(args.out_dir, "neutral_pose_points.xyz"),
            np.concatenate(
                [np.asarray(hout.assets.mean_3d), np.asarray(hout.assets.rgb)], 1
            ),
        )
        turn_frames = []
        for v in range(args.num_views):
            cam = _orbit_camera(
                center, 2.5, 2 * math.pi * v / args.num_views,
                [max(H, W) * 1.2] * 2, [W / 2, H / 2],
            )
            img = render_assets(hout.assets_refined, cam)
            save_image(osp.join(args.out_dir, f"neutral_{v:04d}.png"), img)
            turn_frames.append(np.asarray(img))
        if args.video and turn_frames:
            from ..utils.vis import write_video

            write_video(osp.join(args.out_dir, "turntable.mp4"), turn_frames, args.fps)
        print(f"turntable written to {args.out_dir}")
        return

    assert args.motion_dir, "--motion_dir required unless --neutral_pose"
    frames_out = []
    motion_files = sorted(glob(osp.join(args.motion_dir, "*.json")))
    base_cam_key = sorted(subject.cam_params.keys())[0]
    cp = subject.cam_params[base_cam_key]
    from ..core.camera import Camera

    for vi, mf in enumerate(motion_files):
        with open(mf) as f:
            p = {k: np.asarray(v, np.float32) for k, v in json.load(f).items()}
        pose = PosedSMPLXParams(
            root_pose=jnp.asarray(p["root_pose"].reshape(3)),
            body_pose=jnp.asarray(p["body_pose"].reshape(21, 3)),
            jaw_pose=jnp.asarray(p["jaw_pose"].reshape(3)),
            leye_pose=jnp.asarray(p.get("leye_pose", np.zeros(3)).reshape(3)),
            reye_pose=jnp.asarray(p.get("reye_pose", np.zeros(3)).reshape(3)),
            lhand_pose=jnp.asarray(p["lhand_pose"].reshape(15, 3)),
            rhand_pose=jnp.asarray(p["rhand_pose"].reshape(15, 3)),
            expr=jnp.asarray(p["expr"].reshape(-1)[:E]),
            trans=jnp.asarray(p["trans"].reshape(3)),
        )
        if args.view_rot:
            angle = 2 * math.pi * vi / max(len(motion_files), 1)
            cam = _orbit_camera(
                np.asarray([0.0, 0.0, 2.5]), 2.5, angle,
                cp["focal"], [W / 2, H / 2],
            )
        else:
            cam = Camera(
                R=jnp.asarray(cp["R"]), t=jnp.asarray(cp["t"]),
                focal=jnp.asarray(cp["focal"]), princpt=jnp.asarray(cp["princpt"]),
            )
        hout = human_forward(
            state.trainables.human, bundle.buffers, prior, pose,
            bundle.id_info, cam.R, cam.t, cfg,
        )
        img = render_assets(hout.assets_refined, cam)
        save_image(osp.join(args.out_dir, f"motion_{vi:05d}.png"), img)
        frames_out.append(np.asarray(img))
        print(f"motion frame {vi} done")

    if args.video and frames_out:
        from ..utils.vis import write_video

        write_video(osp.join(args.out_dir, "motion.mp4"), frames_out, args.fps)
        print("wrote motion.mp4")


if __name__ == "__main__":
    main()
