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
    args = ap.parse_args()
    out_dir = args.out_dir or osp.join(args.subject_root, "smplx_optimized")

    from ..fitting.config import FittingConfig
    from ..fitting.fit import (
        fit_step, init_fit_state, make_fit_optimizer, stage_flags,
    )
    from ..fitting.model import FitFrameData, build_fit_statics
    from ..fitting.params import init_fitting_params
    from ..core.rotations import rotation_6d_to_axis_angle
    from ..utils import make_logger

    cfg = FittingConfig(batch_size=args.batch_size)
    logger = make_logger(osp.join(args.subject_root, "log"), "fit_logs.txt")

    # assets
    if args.human_model_path:
        from ..models.smplx import load_prior_tables, load_smplx_assets
        from ..models.smplx.flame import load_flame_assets

        smplx_assets = load_smplx_assets(args.human_model_path, "male")
        flame_assets = load_flame_assets(args.human_model_path)
        tables = load_prior_tables(args.human_model_path)
        face_vertex_idx = tables["face_vertex_idx"]
        flip = np.load(
            osp.join(args.human_model_path, "smplx",
                     "smplx_flip_correspondences.npz")
        )
        statics = build_fit_statics(
            smplx_assets, flame_assets, face_vertex_idx,
            flip["closest_faces"], flip["bc"],
        )
    else:
        from ..models.smplx import build_prior, synthetic_smplx_assets
        from ..models.smplx.flame import synthetic_flame_assets

        smplx_assets = synthetic_smplx_assets()
        # the expression space is SHARED between the two models — keep dims equal
        flame_assets, _ = synthetic_flame_assets(num_expr=smplx_assets.num_expr)
        prior = build_prior(smplx_assets)
        fv = np.asarray(prior.face_vertex_idx)
        Vf = flame_assets.num_vertices
        fv = (np.concatenate([fv, np.tile(fv[-1:], max(0, Vf - fv.size))])[:Vf])
        statics = build_fit_statics(smplx_assets, flame_assets, fv)

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
            for itr in range(cfg.itr_opt_num(epoch)):
                lr, root_only, allow_shared, warmup, hjo = stage_flags(cfg, epoch, itr)
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
    logger.info(f"fitting results written to {out_dir}")


if __name__ == "__main__":
    main()
