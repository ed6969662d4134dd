"""Face-texture unwrap CLI (reference fitting/main/unwrap.py).

Poses the fitted SMPL-X per frame, takes the FLAME-correspondence face
region, and unwraps video pixels into the 512x512 UV atlas averaged over
frames; writes smplx_optimized/face_texture.png + face_texture_mask.png in
the reference layout the avatar stage consumes.

python -m exavatar_release_tpu.apps.unwrap --subject_root <dir>
    [--human_model_path <dir>] [--uv_size 512] [--max_frames 64]
"""
from __future__ import annotations

import argparse
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject_root", required=True)
    ap.add_argument("--human_model_path", default=None)
    ap.add_argument("--uv_size", type=int, default=512)
    ap.add_argument("--max_frames", type=int, default=64)
    args = ap.parse_args()

    import cv2

    from ..data.subject import load_subject
    from ..fitting.unwrap import build_uv_maps, unwrap_sequence
    from ..models.smplx import SMPLXParams, smplx_forward
    from .common import build_prior_for

    subject = load_subject(args.subject_root, split="train", repeat=1)
    prior = build_prior_for(args.human_model_path)
    a = prior.assets

    # UV tables over the face mesh (FLAME UV for real assets)
    from .common import face_mesh_for

    face_faces, vertex_uv, face_uv = face_mesh_for(args.human_model_path, prior)
    uv_maps = build_uv_maps(
        jnp.asarray(vertex_uv), jnp.asarray(face_uv),
        (args.uv_size, args.uv_size),
    )

    fv = jnp.asarray(np.asarray(prior.face_vertex_idx))
    shape = jnp.asarray(
        subject.shape_param if subject.shape_param is not None
        else np.zeros(a.num_shape, np.float32)
    )[: a.num_shape]
    if shape.shape[0] < a.num_shape:
        shape = jnp.pad(shape, (0, a.num_shape - shape.shape[0]))

    @jax.jit
    def face_mesh_cam(p: SMPLXParams):
        out = smplx_forward(a, p, with_landmarks=False)
        return out.vertices[fv]

    frame_ids = sorted(set(subject.frame_ids))[: args.max_frames]
    meshes, imgs, focals, princpts = [], [], [], []
    for fid in frame_ids:
        sp = subject.smplx_params.get(fid)
        if sp is None or fid not in subject.img_paths:
            continue
        E = a.num_expr
        p = SMPLXParams(
            betas=shape,
            expr=jnp.asarray(sp["expr"], jnp.float32).reshape(-1)[:E],
            root_pose=jnp.asarray(sp["root_pose"]).reshape(3),
            body_pose=jnp.asarray(sp["body_pose"]).reshape(21, 3),
            jaw_pose=jnp.asarray(sp["jaw_pose"]).reshape(3),
            leye_pose=jnp.asarray(sp.get("leye_pose", np.zeros(3))).reshape(3),
            reye_pose=jnp.asarray(sp.get("reye_pose", np.zeros(3))).reshape(3),
            lhand_pose=jnp.asarray(sp["lhand_pose"]).reshape(15, 3),
            rhand_pose=jnp.asarray(sp["rhand_pose"]).reshape(15, 3),
            trans=jnp.asarray(sp["trans"]).reshape(3),
        )
        meshes.append(face_mesh_cam(p))
        img = cv2.imread(subject.img_paths[fid])[:, :, ::-1]
        imgs.append(jnp.asarray(img.astype(np.float32).transpose(2, 0, 1) / 255.0))
        cp = subject.cam_params[fid]
        focals.append(jnp.asarray(cp["focal"]))
        princpts.append(jnp.asarray(cp["princpt"]))
    assert meshes, "no frames with fitted params + images"

    tex, mask = unwrap_sequence(
        uv_maps,
        jnp.stack(meshes),
        jnp.asarray(np.asarray(face_faces, np.int32)),
        jnp.stack(imgs),
        jnp.stack(focals),
        jnp.stack(princpts),
    )
    out_dir = osp.join(args.subject_root, "smplx_optimized")
    import os

    os.makedirs(out_dir, exist_ok=True)
    tex_u8 = (np.clip(np.asarray(tex).transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
    mask_u8 = (np.asarray(mask)[0] * 255).astype(np.uint8)
    cv2.imwrite(osp.join(out_dir, "face_texture.png"), tex_u8[:, :, ::-1])
    cv2.imwrite(
        osp.join(out_dir, "face_texture_mask.png"),
        np.repeat(mask_u8[:, :, None], 3, axis=2),
    )
    print(
        f"unwrapped {len(meshes)} frames -> {out_dir}/face_texture.png "
        f"(coverage {float((mask_u8 > 0).mean()):.1%})"
    )


if __name__ == "__main__":
    main()
