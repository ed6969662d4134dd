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
    ap.add_argument("--deca_cmd", default="")
    ap.add_argument("--hand4whole_cmd", default="")
    ap.add_argument("--mmpose_cmd", default="")
    ap.add_argument("--depth_cmd", default="")
    ap.add_argument("--smooth_length", type=int, default=9)
    ap.add_argument("--skip_fit", action="store_true")
    args = ap.parse_args()
    root = args.subject_root

    # 1. cameras
    if args.use_colmap:
        run_colmap(root, args.colmap_bin)
    if not osp.exists(osp.join(root, "sparse", "cameras.txt")) and not glob(
        osp.join(root, "cam_params", "*.json")
    ):
        make_virtual_cams(root)

    # 2. external detectors (pluggable; outputs land in the reference layout)
    run_external("SAM masks", args.sam_cmd, root)
    run_external("DECA (flame_init)", args.deca_cmd, root)
    run_external("Hand4Whole (smplx_init)", args.hand4whole_cmd, root)
    run_external("mmpose (keypoints_whole_body)", args.mmpose_cmd, root)
    run_external("Depth-Anything (bkg_point_cloud)", args.depth_cmd, root)

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

    print("[preprocess] done")


if __name__ == "__main__":
    main()
