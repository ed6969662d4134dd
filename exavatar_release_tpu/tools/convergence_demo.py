"""Self-contained learning sanity demo: the avatar trains to reproduce
target renders of a known (plausible) appearance.

Target = the same synthetic human with random triplane colors, constant
0.01 Gaussian scales and zero offsets (inside the regularizers' solution
set); train from default init and report the PSNR trajectory.

python -m exavatar_release_tpu.tools.convergence_demo [--steps 300]
"""
from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np


def build_setup(H=48, W=64, rings=8, segs=12, backend="ref",
                max_per_tile=512, capacity=256):
    import os.path as osp

    sys.path.insert(
        0,
        osp.join(osp.dirname(osp.dirname(osp.dirname(
            osp.abspath(__file__)))), "tests"),
    )
    from avatar_fixture import AvatarSetup

    return AvatarSetup(
        H=H, W=W, capacity=capacity, n_scene=120, n_frames=2, rings=rings,
        segs=segs, backend=backend, max_per_tile=max_per_tile,
        focal=60.0 * (H / 48.0),
    )


def constant_head(mlp, value):
    return mlp._replace(
        weights=tuple(jnp.zeros_like(w) for w in mlp.weights),
        biases=tuple(jnp.full_like(b, value) for b in mlp.biases),
    )


def main(steps: int = 300, improvement_db: float = 1.0, H: int = 48,
         W: int = 64, rings: int = 8, segs: int = 12, backend: str = "ref",
         max_per_tile: int = 512, capacity: int = 256) -> float:
    import time

    from exavatar_release_tpu.avatar.model import forward_frame
    from exavatar_release_tpu.ops.image_metrics import psnr
    from exavatar_release_tpu.train.loop import (
        ModelBundle, init_train_state, train_step,
    )
    from exavatar_release_tpu.train.optim import make_optimizer

    s = build_setup(H=H, W=W, rings=rings, segs=segs, backend=backend,
                    max_per_tile=max_per_tile, capacity=capacity)
    bundle = ModelBundle(
        buffers=s.buffers, prior=s.prior, statics=s.statics, id_info=s.id_info,
        lpips=s.lpips, face_texture=s.face_texture,
        face_texture_mask=s.face_texture_mask,
        init_joint_offset=s.init_joint_offset,
    )
    rng = np.random.default_rng(7)
    h = s.trainables.human
    tgt = s.trainables.replace(human=h.replace(
        triplane=jnp.asarray(rng.normal(0, 0.5, h.triplane.shape).astype(np.float32)),
        triplane_face=jnp.asarray(
            rng.normal(0, 0.5, h.triplane_face.shape).astype(np.float32)),
        scale_net=constant_head(h.scale_net, float(np.log(0.01))),
        scale_offset_net=constant_head(h.scale_offset_net, 0.0),
        mean_offset_net=constant_head(h.mean_offset_net, 0.0),
        mean_offset_offset_net=constant_head(h.mean_offset_offset_net, 0.0),
    ))

    @jax.jit
    def render(tr, aux, frame):
        out = forward_frame(
            tr, aux, s.buffers, s.prior, s.statics, s.id_info, s.lpips,
            s.face_texture, s.face_texture_mask, s.init_joint_offset, frame,
            jnp.ones(3), s.cfg, is_warmup=False, mode="test",
            settings=s.settings,
        )
        return out.renders["scene_human_img"]

    frames = []
    for fd in s.frame_data:
        img = jnp.clip(render(tgt, s.scene_state.aux, fd).transpose(2, 0, 1), 0, 1)
        frames.append(fd._replace(img=img))
    print("targets rendered", flush=True)

    opt = make_optimizer(s.trainables, s.cfg, 3.0, tot_itr=steps * 2)
    state = init_train_state(s.trainables, s.scene_state.aux, opt)
    key = jax.random.PRNGKey(0)

    def eval_psnr(state):
        return float(np.mean([
            float(psnr(
                jnp.clip(render(state.trainables, state.scene_aux, fd)
                         .transpose(2, 0, 1), 0, 1), fd.img))
            for fd in frames
        ]))

    p0 = eval_psnr(state)
    print(f"PSNR before: {p0:.2f} dB", flush=True)
    t_start = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, losses = train_step(
            state, bundle, frames[i % len(frames)], sub, opt, s.cfg,
            is_warmup=(i < 20), settings=s.settings,
        )
        if i == 21:  # both variants compiled; start the speed clock
            jax.block_until_ready(losses["total"])
            t_start = time.perf_counter()
        if i % 50 == 0:
            print(f"itr {i}: loss {float(losses['total']):.4f}", flush=True)
    jax.block_until_ready(losses["total"])
    if t_start is not None and steps > 22:
        dt = (time.perf_counter() - t_start) / (steps - 22)
        print(f"speed: {dt*1e3:.1f} ms/itr ({1/dt:.2f} itr/s) at {H}x{W}, "
              f"backend={backend}", flush=True)
    p1 = eval_psnr(state)
    print(f"PSNR after {steps} itrs: {p1:.2f} dB (delta {p1 - p0:+.2f})",
          flush=True)
    assert p1 > p0 + improvement_db, (
        f"training must improve PSNR by > {improvement_db} dB"
    )
    print("CONVERGENCE OK", flush=True)
    return p1 - p0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--h", type=int, default=48)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--rings", type=int, default=8)
    ap.add_argument("--segs", type=int, default=12)
    ap.add_argument("--backend", default="ref")
    ap.add_argument("--max_per_tile", type=int, default=512)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--improvement_db", type=float, default=1.0)
    args = ap.parse_args()
    main(args.steps, args.improvement_db, H=args.h, W=args.w,
         rings=args.rings, segs=args.segs, backend=args.backend,
         max_per_tile=args.max_per_tile, capacity=args.capacity)
