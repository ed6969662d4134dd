"""Preprocessing orchestrator (reference fitting/tools/run.py:36-120).

Chains the per-subject preprocessing:
  frames -> [COLMAP | virtual cams] -> external detectors (DECA, Hand4Whole,
  mmpose, SAM, Depth-Anything) -> fit -> unwrap -> smooth.

External model-zoo detectors are pluggable CPU/GPU commands supplied by the
user (SURVEY.md §2 C24: the reference also shells out to separately-cloned
repos); this framework consumes their JSON/png outputs. Steps whose tool is
absent are skipped with a warning so partially-prepared subjects still
progress.

python -m exavatar_release_tpu.apps.preprocess --subject_root <dir>
    [--human_model_path <dir>] [--use_colmap] [--colmap_bin colmap]
    [--smooth_length 9]
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import shutil
import subprocess
import sys
from glob import glob

import numpy as np


def run_colmap(subject_root: str, colmap_bin: str) -> bool:
    """COLMAP CLI chain (reference fitting/tools/run_colmap.py:35-42)."""
    if shutil.which(colmap_bin) is None:
        print(f"[preprocess] {colmap_bin} not found; skipping COLMAP")
        return False
    img_dir = osp.join(subject_root, "images")
    db = osp.join(subject_root, "colmap.db")
    sparse = osp.join(subject_root, "sparse_raw")
    os.makedirs(sparse, exist_ok=True)
    cmds = [
        [colmap_bin, "feature_extractor", "--database_path", db,
         "--image_path", img_dir],
        [colmap_bin, "exhaustive_matcher", "--database_path", db],
        [colmap_bin, "mapper", "--database_path", db, "--image_path", img_dir,
         "--output_path", sparse],
        [colmap_bin, "model_converter", "--input_path", osp.join(sparse, "0"),
         "--output_path", osp.join(subject_root, "sparse"),
         "--output_type", "TXT"],
    ]
    os.makedirs(osp.join(subject_root, "sparse"), exist_ok=True)
    for cmd in cmds:
        subprocess.run(cmd, check=True)
    return True


def make_virtual_cams(subject_root: str, focal: float = 2000.0):
    """Identity-rotation virtual cameras (reference
    fitting/tools/make_virtual_cam_params.py:26-27: R=I, f=2000,
    principal point at the image center)."""
    import cv2

    os.makedirs(osp.join(subject_root, "cam_params"), exist_ok=True)
    for p in glob(osp.join(subject_root, "images", "*.png")):
        fid = osp.basename(p).split(".")[0]
        h, w = cv2.imread(p).shape[:2]
        payload = {
            "R": np.eye(3).tolist(), "t": [0.0, 0.0, 0.0],
            "focal": [focal, focal], "princpt": [w / 2.0, h / 2.0],
        }
        with open(osp.join(subject_root, "cam_params", f"{fid}.json"), "w") as f:
            json.dump(payload, f)


def run_external(name: str, cmd_tmpl: str, subject_root: str) -> bool:
    """Run a user-supplied external detector command (SAM / DECA /
    Hand4Whole / mmpose / Depth-Anything equivalents)."""
    if not cmd_tmpl:
        print(f"[preprocess] no command configured for {name}; skipping "
              f"(expects its outputs to already exist)")
        return False
    cmd = cmd_tmpl.format(subject_root=subject_root)
    print(f"[preprocess] {name}: {cmd}")
    subprocess.run(cmd, shell=True, check=True)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject_root", required=True)
    ap.add_argument("--human_model_path", default=None)
    ap.add_argument("--use_colmap", action="store_true")
    ap.add_argument("--colmap_bin", default="colmap")
    ap.add_argument("--sam_cmd", default="")
    ap.add_argument("--sam_checkpoint", default="sam_vit_h_4b8939.pth")
    ap.add_argument("--sam_model_type", default="vit_h")
    ap.add_argument("--deca_cmd", default="")
    ap.add_argument("--hand4whole_cmd", default="")
    ap.add_argument("--mmpose_cmd", default="")
    ap.add_argument("--depth_cmd", default="")
    ap.add_argument("--depth_checkpoint",
                    default="checkpoints/depth_anything_v2_vitl.pth")
    ap.add_argument("--depth_encoder", default="vitl")
    ap.add_argument("--smooth_length", type=int, default=9)
    ap.add_argument("--skip_fit", action="store_true")
    ap.add_argument("--no_vis", action="store_true",
                    help="skip the smoothed-parameter check video")
    args = ap.parse_args()
    root = args.subject_root

    # 0. frames from video (reference fitting/tools/extract_frames.py)
    if osp.exists(osp.join(root, "video.mp4")) and not glob(
        osp.join(root, "frames", "*.png")
    ):
        from .extract_frames import extract_frames

        n = extract_frames(root)
        print(f"[preprocess] extracted {n} frames from video.mp4")

    # 1. cameras
    if args.use_colmap:
        run_colmap(root, args.colmap_bin)
    if not osp.exists(osp.join(root, "sparse", "cameras.txt")) and not glob(
        osp.join(root, "cam_params", "*.json")
    ):
        make_virtual_cams(root)

    # 2. external detectors (pluggable; outputs land in the reference layout)
    # mmpose runs FIRST: its keypoints_whole_body jsons prompt the SAM
    # masks below AND drive the whole fitting stage (reference
    # fitting/tools/run.py:74-81 runs it before fit.py)
    if args.mmpose_cmd:
        run_external("mmpose (keypoints_whole_body)", args.mmpose_cmd, root)
    else:
        # built-in whole-body keypoint driver (apps/run_mmpose.py) when
        # mmpose is importable; clean skip otherwise (import/load-scoped
        # guard — errors inside run_subject surface as themselves)
        mm_infer = None
        try:
            from .run_mmpose import load_mmpose_inferencer
            from .run_mmpose import run_subject as run_mmpose_subject

            mm_infer = load_mmpose_inferencer()
        except ImportError:
            print("[preprocess] mmpose not importable and no --mmpose_cmd; "
                  "skipping whole-body keypoints")
        if mm_infer is not None:
            n = run_mmpose_subject(root, mm_infer,
                                   write_video=not args.no_vis)
            print(f"[preprocess] mmpose keypoints: {n} frames")
    if args.sam_cmd:
        run_external("SAM masks", args.sam_cmd, root)
    else:
        # built-in keypoint-prompted SAM driver (apps/run_sam.py) when the
        # segment_anything package is importable; clean skip otherwise.
        # Only the import/load is guarded — an ImportError raised INSIDE
        # run_subject (e.g. cv2 missing) must surface as itself, and a
        # missing per-frame input mid-run must fail loudly rather than
        # silently leave partial masks the skip logic would never redo.
        predictor = None
        try:
            from .run_sam import load_sam_predictor, run_subject

            predictor = load_sam_predictor(args.sam_checkpoint,
                                           args.sam_model_type)
        except ImportError:
            print("[preprocess] segment_anything not importable and no "
                  "--sam_cmd; skipping SAM masks")
        except FileNotFoundError as e:
            print(f"[preprocess] SAM skipped (missing checkpoint): {e}")
        if predictor is not None:
            n = run_subject(root, predictor, write_video=not args.no_vis)
            print(f"[preprocess] SAM masks: {n} frames")
    run_external("DECA (flame_init)", args.deca_cmd, root)
    run_external("Hand4Whole (smplx_init)", args.hand4whole_cmd, root)

    # 3. fit
    if not args.skip_fit:
        cmd = [sys.executable, "-m", "exavatar_release_tpu.apps.fit",
               "--subject_root", root]
        if args.human_model_path:
            cmd += ["--human_model_path", args.human_model_path]
        subprocess.run(cmd, check=True)

    # 4. unwrap the face texture from the fitted parameters
    cmd = [sys.executable, "-m", "exavatar_release_tpu.apps.unwrap",
           "--subject_root", root]
    if args.human_model_path:
        cmd += ["--human_model_path", args.human_model_path]
    try:
        subprocess.run(cmd, check=True)
    except subprocess.CalledProcessError as e:
        print(f"[preprocess] unwrap failed ({e}); continuing")

    # 5. smooth the fitted parameters in place
    from ..fitting.smooth import smooth_sequence

    param_dir = osp.join(root, "smplx_optimized", "smplx_params")
    files = sorted(glob(osp.join(param_dir, "*.json")),
                   key=lambda p: int(osp.basename(p).split(".")[0]))
    if files:
        seq = []
        for p in files:
            with open(p) as f:
                seq.append({k: np.asarray(v, np.float32) for k, v in json.load(f).items()})
        smoothed = smooth_sequence(seq, window_length=args.smooth_length)
        for p, s in zip(files, smoothed):
            with open(p, "w") as f:
                json.dump({k: np.asarray(v).tolist() for k, v in s.items()}, f)
        print(f"[preprocess] smoothed {len(files)} frames")

        if not args.no_vis:
            try:
                smooth_check_video(root, args.human_model_path, files, smoothed)
            except Exception as e:  # the video is an instrument, not a gate
                print(f"[preprocess] smooth check video failed ({e}); continuing")

    # 6. background point cloud from monocular depth — AFTER fit/smooth so
    # the metric alignment can render the fitted meshes_smoothed plys (the
    # reference runs its Depth-Anything shim after run.py for the same
    # reason, run_depth_anything.py:85-91)
    if args.depth_cmd:
        run_external("Depth-Anything (bkg_point_cloud)", args.depth_cmd, root)
    elif not osp.exists(osp.join(root, "bkg_point_cloud.txt")):
        depth_fn = None
        try:
            from .run_depth_anything import load_depth_model
            from .run_depth_anything import run_subject as run_depth_subject

            depth_fn = load_depth_model(args.depth_checkpoint,
                                        args.depth_encoder)
        except ImportError:
            print("[preprocess] depth_anything_v2 not importable and no "
                  "--depth_cmd; skipping bkg_point_cloud")
        except FileNotFoundError as e:
            print(f"[preprocess] Depth-Anything skipped (missing "
                  f"checkpoint): {e}")
        if depth_fn is not None:
            run_depth_subject(root, depth_fn, write_video=not args.no_vis)

    print("[preprocess] done")


def smooth_check_video(root, human_model_path, files, smoothed):
    """Re-render the SMOOTHED parameters: per-frame meshes, overlay renders,
    and the side-by-side check video (reference
    fitting/tools/smooth_smplx_params.py:148-205)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from ..fitting.params import init_fitting_params
    from ..utils.mesh_io import save_ply
    from ..utils.vis import render_mesh_overlay, write_video
    from .common import build_fit_statics_for
    from .fit import _fit_vis_meshes

    statics = build_fit_statics_for(human_model_path)
    out_dir = osp.join(root, "smplx_optimized")

    def load_json(name, default):
        p = osp.join(out_dir, name)
        if osp.exists(p):
            with open(p) as f:
                return np.asarray(json.load(f), np.float32)
        return default

    a = statics.smplx_assets
    shape = load_json("shape_param.json", np.zeros(a.num_shape, np.float32))
    joint_offset = load_json(
        "joint_offset.json", np.zeros((a.num_joints, 3), np.float32))
    locator_offset = load_json(
        "locator_offset.json", np.zeros((a.num_joints, 3), np.float32))
    face_offset = load_json(
        "face_offset.json",
        np.zeros((statics.flame_assets.num_vertices, 3), np.float32))

    E = statics.flame_assets.num_expr
    z3 = np.zeros(3, np.float32)
    flame_stub = [
        {"root_pose": z3, "neck_pose": z3, "jaw_pose": s["jaw_pose"],
         "leye_pose": s["leye_pose"], "reye_pose": s["reye_pose"],
         "expr": np.asarray(s["expr"], np.float32).reshape(-1)[:E],
         "trans": np.asarray(s["trans"], np.float32)}
        for s in smoothed
    ]
    params = init_fitting_params(
        smoothed, flame_stub, np.zeros(statics.flame_assets.num_shape),
        a.num_shape, statics.flame_assets.num_vertices, a.num_joints,
    ).replace(
        smplx_shape=jnp.asarray(shape.reshape(-1)[: a.num_shape]),
        joint_offset=jnp.asarray(joint_offset),
        locator_offset=jnp.asarray(locator_offset),
        face_offset=jnp.asarray(face_offset),
    )

    meshes_dir = osp.join(out_dir, "meshes_smoothed")
    renders_dir = osp.join(out_dir, "renders_smoothed")
    os.makedirs(meshes_dir, exist_ok=True)
    os.makedirs(renders_dir, exist_ok=True)
    sfaces = np.asarray(a.faces)
    decode = jax.jit(lambda i: _fit_vis_meshes(statics, params, i)[0])

    video_frames = []
    for i, p in enumerate(files):
        fid = int(osp.basename(p).split(".")[0])
        mesh = decode(i)
        save_ply(osp.join(meshes_dir, f"{fid}_smplx.ply"), np.asarray(mesh),
                 sfaces)
        img_path = None
        for sub in ("images", "frames"):
            for ext in (".png", ".jpg"):
                cand = osp.join(root, sub, f"{fid}{ext}")
                if osp.exists(cand):
                    img_path = cand
                    break
            if img_path:
                break
        cam_path = osp.join(root, "cam_params", f"{fid}.json")
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
        write_video(osp.join(root, "smplx_optimized_smoothed.mp4"), video_frames)
        print(f"[preprocess] smooth check video: {len(video_frames)} frames")


if __name__ == "__main__":
    main()
