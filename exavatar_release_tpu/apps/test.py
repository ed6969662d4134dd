"""Avatar test-render CLI (reference avatar/main/test.py): render every
test-split frame and dump the 9 composition images.

python -m exavatar_release_tpu.apps.test --subject_root <dir> --ckpt <npz>
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np


def save_image(path, img_hwc):
    import cv2

    arr = np.clip(np.asarray(img_hwc), 0, 1)
    cv2.imwrite(path, (arr[..., ::-1] * 255).astype(np.uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject_root", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--human_model_path", default=None)
    ap.add_argument("--out_dir", default="output/result")
    ap.add_argument("--scene_capacity", type=int, default=1 << 17)
    ap.add_argument("--triplane_ch", type=int, default=32)
    ap.add_argument("--triplane_res", type=int, default=128)
    ap.add_argument("--raster_backend", default="pallas", choices=["pallas", "ref"])
    ap.add_argument("--pair_major", action="store_true",
                    help="ragged pair-major compositing — the right mode at reference avatar density (no per-tile capacity, no truncation)")
    args = ap.parse_args()

    from ..avatar.config import AvatarConfig
    from ..avatar.model import forward_frame
    from ..data.subject import load_frame_arrays, load_subject
    from ..ops.rasterizer.api import RasterizeSettings
    from ..train.checkpoint import load_checkpoint
    from ..train.loop import init_train_state
    from ..train.optim import make_optimizer
    from .common import (
        build_prior_for,
        face_mesh_for,
        frame_to_device,
        subject_bundle,
    )

    cfg = AvatarConfig(scene_capacity=args.scene_capacity, triplane_ch=args.triplane_ch, triplane_res=args.triplane_res)
    subject = load_subject(args.subject_root, split="test", repeat=1)
    prior = build_prior_for(args.human_model_path)
    flame_faces, vertex_uv, face_uv = face_mesh_for(args.human_model_path, prior)

    trainables, scene_state, bundle, frame_row_of = subject_bundle(
        subject, prior, cfg, flame_faces, vertex_uv, face_uv,
        lpips_quiet=True,
    )
    opt = make_optimizer(trainables, cfg, 1.0, 1)
    state = init_train_state(trainables, scene_state.aux, opt)
    state, epoch = load_checkpoint(args.ckpt, state)
    print(f"loaded epoch {epoch} from {args.ckpt}")

    os.makedirs(args.out_dir, exist_ok=True)
    settings = RasterizeSettings(backend=args.raster_backend,
                                 pair_major=args.pair_major)

    for frame_idx in sorted(set(subject.frame_ids)):
        arrs = load_frame_arrays(subject, frame_idx)
        arrs["frame_row"] = frame_row_of[frame_idx]
        frame = frame_to_device(arrs)
        out = forward_frame(
            state.trainables, state.scene_aux, bundle.buffers, bundle.prior,
            bundle.statics, bundle.id_info, bundle.lpips, bundle.face_texture,
            bundle.face_texture_mask, bundle.init_joint_offset, frame,
            jnp.ones(3), cfg, is_warmup=False, mode="test", settings=settings,
        )
        for name in (
            "scene_img", "human_img", "scene_human_img", "human_img_refined",
            "scene_human_img_refined", "human_face_img",
            "human_face_img_refined", "scene_human_img_composed",
            "scene_human_img_refined_composed",
        ):
            save_image(
                osp.join(args.out_dir, f"{frame_idx}_{name}.png"),
                out.renders[name],
            )
        print(f"frame {frame_idx} done")


if __name__ == "__main__":
    main()
