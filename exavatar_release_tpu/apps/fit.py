"""SMPL-X/FLAME fitting CLI (reference fitting/main/fit.py).

python -m exavatar_release_tpu.apps.fit --subject_root <dir>
    [--human_model_path <dir>] [--out_dir <dir>]

Consumes the reference preprocessing outputs (keypoints_whole_body/,
smplx_init/, flame_init/, cam_params/) and writes smplx_optimized/ in the
reference layout the avatar stage reads.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject_root", required=True)
    ap.add_argument("--human_model_path", default=None)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--no_vis", action="store_true",
                    help="skip mesh/overlay/video dumps (reference fit.py "
                         "saves them unconditionally, fit.py:147-207)")
    args = ap.parse_args()
    out_dir = args.out_dir or osp.join(args.subject_root, "smplx_optimized")

    from ..fitting.config import FittingConfig
    from ..fitting.fit import (
        fit_step, init_fit_state, make_fit_optimizer,
        reinit_opt_on_stage_change, stage_flags,
    )
    from ..fitting.model import FitFrameData, build_fit_statics
    from ..fitting.params import init_fitting_params
    from ..core.rotations import rotation_6d_to_axis_angle
    from ..utils import make_logger

    cfg = FittingConfig(batch_size=args.batch_size)
    logger = make_logger(osp.join(args.subject_root, "log"), "fit_logs.txt")

    # assets
    from .common import build_fit_statics_for

    statics = build_fit_statics_for(args.human_model_path)

    # initial per-frame estimates (Hand4Whole smplx_init/, DECA flame_init/)
    def load_dir(name):
        out = {}
        for p in glob(osp.join(args.subject_root, name, "*.json")):
            stem = osp.basename(p).split(".")[0]
            if not stem.isdigit():  # e.g. flame_init/shape_param.json
                continue
            fid = int(stem)
            with open(p) as f:
                out[fid] = {k: np.asarray(v, np.float32) for k, v in json.load(f).items()}
        return out

    smplx_init = load_dir("smplx_init")
    flame_init = load_dir("flame_init")
    kpts = load_dir_kpts = {}
    for p in glob(osp.join(args.subject_root, "keypoints_whole_body", "*.json")):
        fid = int(osp.basename(p).split(".")[0])
        with open(p) as f:
            kpts[fid] = np.asarray(json.load(f), np.float32)
    frame_ids = sorted(set(smplx_init) & set(kpts))
    assert frame_ids, "no frames with both smplx_init and keypoints"

    flame_shape = np.zeros(statics.flame_assets.num_shape, np.float32)
    shape_path = osp.join(args.subject_root, "flame_init", "shape_param.json")
    if osp.exists(shape_path):
        with open(shape_path) as f:
            loaded = np.asarray(json.load(f), np.float32).reshape(-1)
        n = min(loaded.size, flame_shape.size)
        flame_shape[:n] = loaded[:n]

    E = statics.flame_assets.num_expr

    def norm_flame(fid):
        d = flame_init.get(fid, {})
        z3 = np.zeros(3, np.float32)
        return {
            "root_pose": d.get("root_pose", z3), "neck_pose": d.get("neck_pose", z3),
            "jaw_pose": d.get("jaw_pose", z3), "leye_pose": d.get("leye_pose", z3),
            "reye_pose": d.get("reye_pose", z3),
            "expr": d.get("expr", np.zeros(E, np.float32))[:E],
            "trans": d.get("trans", np.asarray([0, 0, 1], np.float32)),
        }

    params = init_fitting_params(
        [smplx_init[f] for f in frame_ids],
        [norm_flame(f) for f in frame_ids],
        flame_shape,
        statics.smplx_assets.num_shape,
        statics.flame_assets.num_vertices,
        statics.smplx_assets.num_joints,
    )
    opt = make_fit_optimizer()
    state = init_fit_state(params, opt)

    # per-frame supervision in the normalized projection space
    proj_h, proj_w = cfg.proj_shape
    frames_list = []
    for fid in frame_ids:
        k = kpts[fid]
        valid = (k[:, 2:3] > 0.5).astype(np.float32)
        # normalize keypoints into the proj space via their bbox
        xy = k[:, :2]
        v = valid[:, 0] > 0
        lo = xy[v].min(0) if v.any() else np.zeros(2)
        hi = xy[v].max(0) if v.any() else np.ones(2)
        span = np.maximum(hi - lo, 1e-3)
        xy_n = (xy - lo) / span * np.asarray([proj_w, proj_h])
        fi = norm_flame(fid)
        si = smplx_init[fid]
        full_pose = np.concatenate([
            si["root_pose"].reshape(1, 3), si["body_pose"].reshape(21, 3),
            fi["jaw_pose"].reshape(1, 3), fi["leye_pose"].reshape(1, 3),
            fi["reye_pose"].reshape(1, 3), si["lhand_pose"].reshape(15, 3),
            si["rhand_pose"].reshape(15, 3),
        ])
        frames_list.append(FitFrameData(
            kpt_img=jnp.asarray(xy_n), kpt_valid=jnp.asarray(valid),
            focal_proj=jnp.asarray([proj_w / 2.0, proj_h / 2.0]),
            princpt_proj=jnp.asarray([proj_w / 2.0, proj_h / 2.0]),
            flame_valid=jnp.asarray(fid in flame_init),
            init_smplx_pose=jnp.asarray(full_pose),
            init_flame_pose=jnp.asarray(np.stack([
                fi["neck_pose"], fi["jaw_pose"], fi["leye_pose"], fi["reye_pose"]
            ])),
            init_flame_shape=jnp.asarray(flame_shape),
            init_flame_expr=jnp.asarray(fi["expr"]),
        ))

    B = min(cfg.batch_size, len(frame_ids))
    for epoch in range(cfg.end_epoch):
        for b0 in range(0, len(frame_ids), B):
            rows = np.arange(b0, min(b0 + B, len(frame_ids)))
            batch = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[frames_list[i] for i in rows]
            )
            prev_stage = None
            for itr in range(cfg.itr_opt_num(epoch)):
                lr, root_only, allow_shared, warmup, hjo = stage_flags(cfg, epoch, itr)
                state, prev_stage = reinit_opt_on_stage_change(
                    state, opt, prev_stage, (root_only, allow_shared)
                )
                state, losses = fit_step(
                    state, statics, batch, jnp.asarray(rows), opt,
                    jnp.asarray(lr), jnp.asarray(root_only),
                    jnp.asarray(allow_shared), jnp.asarray(warmup),
                    jnp.asarray(hjo),
                )
                if itr % 50 == 0:
                    logger.info(
                        f"epoch {epoch} batch {b0 // B} itr {itr} "
                        f"lr {lr:g} total {float(losses['total']):.4f}"
                    )

    # save in the reference layout (reference fit.py:133-207)
    os.makedirs(osp.join(out_dir, "smplx_params"), exist_ok=True)
    p = state.params
    d6 = rotation_6d_to_axis_angle
    for i, fid in enumerate(frame_ids):
        payload = {
            "root_pose": np.asarray(d6(p.smplx_root_pose[i])).tolist(),
            "body_pose": np.asarray(d6(p.smplx_body_pose[i])).tolist(),
            "jaw_pose": np.asarray(d6(p.jaw_pose[i])).tolist(),
            "leye_pose": np.asarray(d6(p.leye_pose[i])).tolist(),
            "reye_pose": np.asarray(d6(p.reye_pose[i])).tolist(),
            "lhand_pose": np.asarray(d6(p.smplx_lhand_pose[i])).tolist(),
            "rhand_pose": np.asarray(d6(p.smplx_rhand_pose[i])).tolist(),
            "expr": np.asarray(p.expr[i]).tolist(),
            "trans": np.asarray(p.smplx_trans[i]).tolist(),
        }
        with open(osp.join(out_dir, "smplx_params", f"{fid}.json"), "w") as f:
            json.dump(payload, f)
    for name, arr in (
        ("shape_param.json", p.smplx_shape),
        ("face_offset.json", p.face_offset),
        ("joint_offset.json", p.joint_offset),
        ("locator_offset.json", p.locator_offset),
    ):
        with open(osp.join(out_dir, name), "w") as f:
            json.dump(np.asarray(arr).tolist(), f)

    if not args.no_vis:
        _save_fit_vis(args, out_dir, statics, p, frame_ids, logger)
    logger.info(f"fitting results written to {out_dir}")


def _save_fit_vis(args, out_dir, statics, p, frame_ids, logger):
    """Fit-time correctness instruments (reference fitting/main/fit.py:147-207):
    per-frame fitted SMPL-X/FLAME meshes, one-time canonical meshes, overlay
    renders over the video frames, and the side-by-side check video."""
    import cv2
    import jax as _jax

    from ..fitting.model import _decode_frame, flame_coords, smplx_coords
    from ..utils.mesh_io import save_ply
    from ..utils.vis import render_mesh_overlay, write_video

    meshes_dir = osp.join(out_dir, "meshes")
    renders_dir = osp.join(out_dir, "renders")
    os.makedirs(meshes_dir, exist_ok=True)
    os.makedirs(renders_dir, exist_ok=True)
    sfaces = np.asarray(statics.smplx_assets.faces)
    ffaces = np.asarray(statics.flame_assets.faces)

    # one-time canonical meshes (reference fit.py:149-153)
    sp0, fp0 = _decode_frame(p, 0)
    z3 = jnp.zeros(3)
    mesh_wo, _, _ = smplx_coords(
        statics, sp0, z3, p, use_pose=False, use_expr=False
    )
    save_ply(osp.join(out_dir, "smplx_wo_pose_wo_expr.ply"),
             np.asarray(mesh_wo), sfaces)
    mesh_wo_fo, _, _ = smplx_coords(
        statics, sp0, z3, p, use_pose=False, use_expr=False,
        use_face_offset=False,
    )
    save_ply(osp.join(out_dir, "smplx_wo_pose_wo_expr_wo_fo.ply"),
             np.asarray(mesh_wo_fo), sfaces)
    fmesh_wo, _ = flame_coords(statics, fp0, z3, use_pose=False, use_expr=False)
    save_ply(osp.join(out_dir, "flame_wo_pose_wo_expr.ply"),
             np.asarray(fmesh_wo), ffaces)

    decode = _jax.jit(lambda i: _fit_vis_meshes(statics, p, i))
    video_frames = []
    for i, fid in enumerate(frame_ids):
        mesh, fmesh = decode(i)
        save_ply(osp.join(meshes_dir, f"{fid}_smplx.ply"), np.asarray(mesh),
                 sfaces)
        save_ply(osp.join(meshes_dir, f"{fid}_flame.ply"), np.asarray(fmesh),
                 ffaces)

        img_path = None
        for ext in (".png", ".jpg"):
            cand = osp.join(args.subject_root, "images", f"{fid}{ext}")
            if osp.exists(cand):
                img_path = cand
                break
        cam_path = osp.join(args.subject_root, "cam_params", f"{fid}.json")
        if img_path is None or not osp.exists(cam_path):
            continue
        img = cv2.imread(img_path)[:, :, ::-1].astype(np.float32) / 255.0
        with open(cam_path) as f:
            camd = json.load(f)
        overlay = render_mesh_overlay(
            img, mesh, jnp.asarray(sfaces),
            np.asarray(camd["focal"], np.float32),
            np.asarray(camd["princpt"], np.float32),
        )
        cv2.imwrite(osp.join(renders_dir, f"{fid}_smplx.jpg"),
                    (np.clip(overlay, 0, 1)[:, :, ::-1] * 255).astype(np.uint8))
        video_frames.append(np.concatenate([img, overlay], axis=1))

    if video_frames:
        write_video(
            osp.join(osp.dirname(out_dir) or ".", "smplx_optimized.mp4"),
            video_frames,
        )
        logger.info(f"check video: {len(video_frames)} frames")


def _fit_vis_meshes(statics, p, i):
    from ..fitting.model import _decode_frame, flame_coords, smplx_coords

    sp, fp = _decode_frame(p, i)
    mesh, _, _ = smplx_coords(statics, sp, p.smplx_trans[i], p)
    fmesh, _ = flame_coords(statics, fp, p.flame_trans[i])
    return mesh, fmesh


if __name__ == "__main__":
    main()
