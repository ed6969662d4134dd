"""Avatar training CLI (reference avatar/main/train.py).

python -m exavatar_release_tpu.apps.train --subject_root <dir>
    [--human_model_path <dir>] [--fit_pose_to_test] [--continue_train]
    [--epochs N] [--out_dir <dir>]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subject_root", required=True)
    ap.add_argument("--human_model_path", default=None)
    ap.add_argument("--fit_pose_to_test", action="store_true")
    ap.add_argument("--continue_train", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--repeat", type=int, default=100)
    ap.add_argument("--out_dir", default="output")
    ap.add_argument("--lpips_weights", default=None)
    ap.add_argument(
        "--allow_random_lpips", action="store_true",
        help="train with randomly-initialized LPIPS features. The reference "
             "trains against pretrained VGG-LPIPS at weight 0.2 (reference "
             "avatar/common/nets/loss.py:80-97); results are NOT comparable "
             "without real weights, so omitting --lpips_weights is an error "
             "unless this flag is set. Produce weights once with: python -m "
             "exavatar_release_tpu.ops.lpips --net vgg --backbone "
             "vgg16_features.pth --lins lpips_v01_vgg.pth --out lpips_vgg.npz",
    )
    ap.add_argument("--scene_capacity", type=int, default=1 << 17)
    ap.add_argument("--gender", default="male")
    ap.add_argument("--triplane_ch", type=int, default=32)
    ap.add_argument("--triplane_res", type=int, default=128)
    ap.add_argument("--raster_backend", default="pallas", choices=["pallas", "ref"])
    ap.add_argument(
        "--pair_major", action="store_true",
        help="ragged pair-major compositing from the start — the right "
             "mode at reference avatar density (no per-tile capacity, no "
             "truncation); without it the capacity governor switches "
             "automatically when dense-window pressure passes K=4096")
    ap.add_argument("--loader", default="auto", choices=["auto", "native", "python"],
                    help="frame decode pipeline: native C++ prefetcher or cv2")
    ap.add_argument(
        "--gaussian_shard", action="store_true",
        help="with --mesh tile>1: shard the Gaussians over the tile axis "
             "too (all_to_all band exchange; per-chip projection/binning "
             "work N/D instead of N)")
    ap.add_argument("--max_itrs", type=int, default=None, help="debug cap")
    ap.add_argument("--profile_dir", default=None,
                    help="capture a jax.profiler trace of itrs 20-40")
    ap.add_argument(
        "--mesh", default=None,
        help="device mesh, e.g. 'data=2,tile=4': DP over frames x row-band-"
             "sharded rendering (parallel/dp_tile_train). Each step consumes"
             " <data> frames; needs data*tile visible devices.",
    )
    args = ap.parse_args()

    from ..avatar.config import AvatarConfig
    from ..data.subject import FramePrefetcher, load_frame_arrays, load_subject
    from ..native import native_available
    from ..ops.rasterizer.api import RasterizeSettings
    from ..train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
    from ..train.loop import init_train_state, maybe_adjust_gaussians, train_step
    from ..train.optim import make_optimizer
    from ..utils import Timer, make_logger
    from ..utils.profiling import trace as profiler_trace
    from .common import build_prior_for, frame_to_device, subject_bundle

    import dataclasses as _dc

    cfg = AvatarConfig(
        scene_capacity=args.scene_capacity,
        triplane_ch=args.triplane_ch,
        triplane_res=args.triplane_res,
    )
    if args.epochs is not None:
        cfg = _dc.replace(cfg, end_epoch=args.epochs)
    if args.fit_pose_to_test:
        cfg = _dc.replace(cfg, smplx_param_lr=1e-3)

    logger = make_logger(osp.join(args.out_dir, "log"), "train_logs.txt")
    subject = load_subject(
        args.subject_root,
        split="test" if args.fit_pose_to_test else "train",
        repeat=args.repeat,
    )
    prior = build_prior_for(args.human_model_path, args.gender)

    # FLAME face mesh for the face render
    from .common import face_mesh_for

    flame_faces, vertex_uv, face_uv = face_mesh_for(args.human_model_path, prior)

    if args.lpips_weights is None and not args.allow_random_lpips:
        raise SystemExit(
            "training without pretrained LPIPS weights: the perceptual loss "
            "(weight 0.2) would run on random features and the result is not "
            "reference-comparable. Pass --lpips_weights <npz> (see python -m "
            "exavatar_release_tpu.ops.lpips --help for the one-command "
            "converter) or opt in explicitly with --allow_random_lpips."
        )
    trainables, scene_state, bundle, frame_row_of = subject_bundle(
        subject, prior, cfg, flame_faces, vertex_uv, face_uv, args.lpips_weights
    )

    mesh = None
    d_data = 1
    if args.mesh is not None:
        from ..parallel import make_mesh
        from ..parallel.dp_tile_train import dp_tile_train_step
        from ..parallel.dp_train import shard_batch_to_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        d_data = int(spec.get("data", 1))
        d_tile = int(spec.get("tile", 1))
        mesh = make_mesh((d_data, d_tile), ("data", "tile"))
        logger.info(
            f"mesh: data={d_data} x tile={d_tile} over "
            f"{d_data * d_tile} devices; {d_data} frames per step"
        )

    # one optimizer step consumes d_data frames
    itr_per_epoch = len(subject.frame_ids) // d_data
    tot_itr = cfg.end_epoch * itr_per_epoch
    opt = make_optimizer(
        trainables, cfg, float(subject.cam_dist_radius), tot_itr,
        fit_pose_to_test=args.fit_pose_to_test,
    )
    state = init_train_state(trainables, scene_state.aux, opt)

    model_dir = osp.join(args.out_dir, "model_dump")
    start_epoch = 0
    if args.continue_train:
        ck = latest_checkpoint(model_dir)
        if ck:
            state, start_epoch = load_checkpoint(ck, state)
            start_epoch += 1
            logger.info(f"resumed from {ck}")

    settings = RasterizeSettings(
        backend=args.raster_backend, gaussian_shard=args.gaussian_shard,
        pair_major=args.pair_major,
    )
    from ..train.loop import RasterCapacityGovernor

    # the largest render is scene+human; its resolved auto exchange cap is
    # the floor any explicit governor growth must start from
    xcap_floor = 512
    if args.gaussian_shard and mesh is not None and d_tile > 1:
        from ..parallel.sharded_raster import resolve_exchange_cap

        n_max = int(state.trainables.scene.mean.shape[0]) + int(
            prior.vertex_num_upsampled
        )
        xcap_floor = resolve_exchange_cap(n_max, d_tile)
    governor = RasterCapacityGovernor(
        settings, log=logger.info, exchange_cap_floor=xcap_floor
    )
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    tot_timer, gpu_timer, read_timer = Timer(), Timer(), Timer()

    use_native = args.loader == "native" or (
        args.loader == "auto" and native_available()
    )
    if use_native:
        logger.info("using the native C++ prefetching frame loader")

    cur_itr = start_epoch * itr_per_epoch
    for epoch in range(start_epoch, cfg.end_epoch):
        order = rng.permutation(len(subject.frame_ids))
        tot_timer.tic()
        read_timer.tic()
        frames_iter = (
            iter(FramePrefetcher(subject, order)) if use_native
            else (load_frame_arrays(subject, subject.frame_ids[int(k)])
                  for k in order)
        )
        def batched(it, k):
            buf = []
            for x in it:
                buf.append(x)
                if len(buf) == k:
                    yield buf
                    buf = []
            # tail shorter than the data axis is dropped (shapes must stay
            # static across steps); one epoch loses < d_data frames

        for itr, arrs_list in enumerate(batched(frames_iter, d_data)):
            frames = []
            for arrs in arrs_list:
                arrs["frame_row"] = frame_row_of[arrs["frame_idx"]]
                frames.append(frame_to_device(arrs))
            frame = frames[0]
            read_timer.toc()

            gpu_timer.tic()
            if args.profile_dir is not None and cur_itr == 20:
                jax.profiler.start_trace(args.profile_dir)
            if args.profile_dir is not None and cur_itr == 40:
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {args.profile_dir}")
            key, sub = jax.random.split(key)
            if mesh is not None:
                batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
                batch = shard_batch_to_mesh(batch, mesh, "data")
                keys = jax.random.key_data(jax.random.split(sub, d_data))
                state, losses = dp_tile_train_step(
                    state, bundle, batch, keys, opt, cfg, mesh,
                    is_warmup=cfg.is_warmup(cur_itr),
                    fit_pose_to_test=args.fit_pose_to_test,
                    settings=settings,
                )
            else:
                state, losses = train_step(
                    state, bundle, frame, sub, opt, cfg,
                    is_warmup=cfg.is_warmup(cur_itr),
                    fit_pose_to_test=args.fit_pose_to_test,
                    settings=settings,
                )
            key, sub = jax.random.split(key)
            state, dstats = maybe_adjust_gaussians(
                state, sub, cur_itr, cfg, args.fit_pose_to_test, optimizer=opt
            )
            gpu_timer.toc()

            msg = [
                f"Epoch {epoch}/{cfg.end_epoch} itr {itr}/{itr_per_epoch}:",
                "speed: %.2f(%.2fs r%.2f)s/itr" % (
                    tot_timer.average_time, gpu_timer.average_time,
                    read_timer.average_time,
                ),
            ]
            dropped = losses.pop("raster_dropped", None)
            dropped_pairs = losses.pop("raster_dropped_pairs", None)
            truncated = losses.pop("raster_truncated", None)
            xovf = losses.pop("raster_exchange_overflow", None)
            msg += [f"loss_{n}: {float(v):.4f}" for n, v in losses.items()]
            if dropped is not None and float(dropped) > 0:
                # (gaussian, tile) pairs lost to static binning capacities —
                # a cropped footprint during warmup is a silent-quality bug
                msg += [f"raster_dropped: {int(dropped)}"]
            if dropped_pairs is not None:
                # auto-grow the overflowing capacity (recompiles once per
                # growth; zero drops is the steady state)
                settings = governor.update(
                    float(dropped_pairs), float(truncated),
                    float(xovf) if xovf is not None else 0.0,
                )
            if dstats is not None:
                msg += [f"scene_live: {int(dstats['n_live'])}"]
            logger.info(" ".join(msg))

            tot_timer.toc()
            tot_timer.tic()
            read_timer.tic()
            cur_itr += 1
            if args.max_itrs is not None and cur_itr >= args.max_itrs:
                break

        save_checkpoint(model_dir, state, epoch)
        logger.info(f"saved snapshot_{epoch}")


if __name__ == "__main__":
    main()
