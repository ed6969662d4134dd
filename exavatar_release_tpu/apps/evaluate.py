"""Quantitative evaluation (reference avatar/tools/eval_neuman.py:27-65):
PSNR / SSIM / LPIPS(alex) over the test split, background masked by default,
against the composed scene+human render.

python -m exavatar_release_tpu.apps.evaluate --subject_root ... --ckpt ...
    [--no_mask_bkg] [--lpips_weights <npz>]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject_root", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--human_model_path", default=None)
    ap.add_argument("--no_mask_bkg", action="store_true")
    ap.add_argument("--lpips_weights", default=None)
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
    from ..ops.image_metrics import psnr, ssim_map
    from ..ops.lpips import lpips_distance
    from ..ops.rasterizer.api import RasterizeSettings
    from ..train.checkpoint import load_checkpoint
    from ..train.loop import init_train_state
    from ..train.optim import make_optimizer
    from .common import (
        build_prior_for, face_mesh_for, frame_to_device, resolve_lpips,
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
    state, _ = load_checkpoint(args.ckpt, state)

    lpips_p = resolve_lpips(args.lpips_weights, "alex")
    settings = RasterizeSettings(backend=args.raster_backend,
                                 pair_major=args.pair_major)

    scores = {"psnr": [], "ssim": [], "lpips": []}
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
        pred = out.renders["scene_human_img_refined_composed"].transpose(2, 0, 1)
        gt = frame.img
        if not args.no_mask_bkg:
            m = frame.mask
            pred = pred * m
            gt = gt * m
            mask2d = m[0]
        else:
            mask2d = None
        scores["psnr"].append(float(psnr(pred, gt, mask=mask2d)))
        scores["ssim"].append(float(jnp.mean(ssim_map(pred, gt))))
        scores["lpips"].append(
            float(lpips_distance(lpips_p, pred * 2 - 1, gt * 2 - 1))
        )
        print(f"frame {frame_idx}: psnr={scores['psnr'][-1]:.2f}")

    result = {k: float(np.mean(v)) for k, v in scores.items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
