"""Capture reference CUDA rasterizer outputs on the committed golden inputs
and diff them against this repo's goldens (the BASELINE gradient gate).

Run this ON A CUDA HOST with the reference stack installed:

    pip install torch  # CUDA build
    pip install git+https://github.com/leo-frank/diff-gaussian-rasterization-depth
    python tools/capture_cuda_goldens.py [--goldens tests/goldens] \
        [--out cuda_parity_report.json]

It is deliberately standalone: no jax and no exavatar_release_tpu import, so
the goldens directory can be copied to any CUDA box alongside this file.

For every ``tests/goldens/scene*.npz`` it
1. rebuilds the exact rasterizer call the reference makes
   (reference avatar/common/nets/module.py:588-640: view/proj matrices from
   avatar/common/utils/transforms.py:38-70, colors_precomp path, sh dummy);
2. runs forward, then backward with the SAME fixed cotangents
   tools/make_goldens.py used (weighted sums over img/depth/mask);
3. diffs forward outputs and input gradients against the stored golden
   arrays and writes a JSON report + human-readable table.

Conventions shared by both sides (so the diff is meaningful):
* quats are wxyz, normalized;
* princpt is exactly (W/2, H/2) in every golden — the reference projection
  matrix assumes a symmetric frustum (transforms.py:43-64);
* ``radius`` is the per-Gaussian screen-space radius in pixels (int in
  CUDA); compare with tolerance 1 px, as the repo computes it in fp32;
* depth is the alpha-composited depth map of the ``-depth`` fork.
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os.path as osp

import numpy as np


def run_case(path: str, device: str = "cuda"):
    import torch
    from diff_gaussian_rasterization_depth import (
        GaussianRasterizationSettings,
        GaussianRasterizer,
    )

    d = np.load(path)
    H, W = int(d["H"]), int(d["W"])
    focal = float(d["focal"])

    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float32,
                               device=device)

    means3d = t(d["means3d"]).requires_grad_(True)
    scales = t(d["scales"]).requires_grad_(True)
    quats = t(d["quats"]).requires_grad_(True)
    opac = t(d["opacities"]).requires_grad_(True)
    rgbs = t(d["rgbs"]).requires_grad_(True)
    bg = t(d["bg"])

    # reference view/proj construction (transforms.py:38-70 with R=I, t=0,
    # znear=0.01 zfar=100 — module.py:605-606), row-major permuted as the
    # rasterizer expects (module.py:603-607)
    fov_x = 2 * math.atan(W / (2 * focal))
    fov_y = 2 * math.atan(H / (2 * focal))
    view = torch.eye(4, device=device)
    znear, zfar = 0.01, 100.0
    tanx, tany = math.tan(fov_x / 2), math.tan(fov_y / 2)
    proj = torch.zeros(4, 4, device=device)
    proj[0, 0] = 1.0 / tanx
    proj[1, 1] = 1.0 / tany
    proj[2, 2] = zfar / (zfar - znear)
    proj[2, 3] = -(zfar * znear) / (zfar - znear)
    proj[3, 2] = 1.0
    view_matrix = view.permute(1, 0)
    full_proj = view_matrix @ proj.permute(1, 0)
    cam_pos = view_matrix.inverse()[3, :3]

    settings = GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanx, tanfovy=tany, bg=bg,
        scale_modifier=1.0, viewmatrix=view_matrix, projmatrix=full_proj,
        sh_degree=0, campos=cam_pos, prefiltered=False, debug=False,
    )
    rasterizer = GaussianRasterizer(raster_settings=settings)
    mean2d = torch.zeros((means3d.shape[0], 3), device=device,
                         requires_grad=True)
    img, radius, depth, mask = rasterizer(
        means3D=means3d, means2D=mean2d, shs=None, colors_precomp=rgbs,
        opacities=opac, scales=scales, rotations=quats, cov3D_precomp=None,
    )
    img_hwc = img.permute(1, 2, 0)  # golden stores (H, W, 3)

    # fixed cotangents — MUST match tools/make_goldens.py:render_case
    ar = torch.arange(H * W * 3, dtype=torch.float32, device=device)
    wimg = (ar.reshape(H, W, 3) % 7.0 + 1.0) / 7.0
    ar2 = torch.arange(H * W, dtype=torch.float32, device=device)
    wd = (ar2.reshape(H, W) % 5.0 + 1.0) / 5.0
    loss = (
        (img_hwc * wimg).sum()
        + (depth.reshape(H, W) * wd).sum()
        + (mask.reshape(H, W) * wd.T.reshape(H, W)).sum()
    )
    loss.backward()

    g = lambda x: x.grad.detach().cpu().numpy() if x.grad is not None else None
    return {
        "img": img_hwc.detach().cpu().numpy(),
        "depth": depth.reshape(H, W).detach().cpu().numpy(),
        "mask": mask.reshape(H, W).detach().cpu().numpy(),
        "radius": radius.detach().cpu().numpy().astype(np.float32),
        "g_means3d": g(means3d), "g_scales": g(scales), "g_quats": g(quats),
        "g_opacities": g(opac), "g_rgbs": g(rgbs),
    }, d


def diff_case(cuda_out: dict, golden) -> dict:
    report = {}
    for key, cval in cuda_out.items():
        gval = np.asarray(golden[key], np.float32)
        if cval is None:
            report[key] = {"error": "no grad from CUDA rasterizer"}
            continue
        cval = np.asarray(cval, np.float32)
        if cval.shape != gval.shape:
            report[key] = {
                "error": f"shape {cval.shape} vs golden {gval.shape}"
            }
            continue
        adiff = np.abs(cval - gval)
        scale = np.maximum(np.abs(gval), 1e-6)
        tol = 1.0 if key == "radius" else 0.0
        report[key] = {
            "max_abs": float(adiff.max()),
            "mean_abs": float(adiff.mean()),
            "max_rel": float((adiff / scale).max()),
            "allclose_1e-3": bool(
                np.allclose(cval, gval, rtol=1e-3, atol=1e-3 + tol)
            ),
            "allclose_1e-4": bool(
                np.allclose(cval, gval, rtol=1e-4, atol=1e-4 + tol)
            ),
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--goldens",
                    default=osp.join(osp.dirname(osp.dirname(
                        osp.abspath(__file__))), "tests", "goldens"))
    ap.add_argument("--out", default="cuda_parity_report.json")
    ap.add_argument("--device", default="cuda")
    args = ap.parse_args()

    paths = sorted(glob.glob(osp.join(args.goldens, "scene*.npz")))
    assert paths, f"no goldens under {args.goldens}"
    full = {}
    for path in paths:
        name = osp.splitext(osp.basename(path))[0]
        cuda_out, golden = run_case(path, args.device)
        rep = diff_case(cuda_out, golden)
        full[name] = rep
        print(f"== {name}")
        for k, v in rep.items():
            if "error" in v:
                print(f"  {k:12s} ERROR: {v['error']}")
            else:
                ok = "OK " if v["allclose_1e-3"] else "FAIL"
                print(f"  {k:12s} {ok} max_abs={v['max_abs']:.3e} "
                      f"max_rel={v['max_rel']:.3e}")
    n_fail = sum(
        1 for rep in full.values() for v in rep.values()
        if v.get("allclose_1e-3") is False or "error" in v
    )
    full["_summary"] = {"n_tensor_fail_1e-3": n_fail, "n_scenes": len(paths)}
    with open(args.out, "w") as f:
        json.dump(full, f, indent=1)
    print(f"\nwrote {args.out}; {n_fail} tensor diffs over 1e-3 tolerance")


if __name__ == "__main__":
    main()
