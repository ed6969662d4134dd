"""Pallas TPU kernels: tiled 3DGS alpha compositing, forward + backward.

Replaces renderCUDA fwd/bwd of the reference's external CUDA rasterizer
(diff-gaussian-rasterization-depth, consumed at reference
avatar/common/nets/module.py:632-640) with an MXU-centric formulation:

* Per-pixel Gaussian log-density is a quadratic q(px,py); a tile of P pixels
  evaluates a chunk of G Gaussians as one (P×8)@(8×G) matmul on the MXU.
* Front-to-back transmittance is computed in log space; the per-chunk
  exclusive prefix sum of log(1−α) is ANOTHER matmul against a constant
  triangular matrix, so the sequential compositing recurrence also rides the
  MXU. Only exp/log1p touch the VPU.
* CUDA's sticky early termination (a Gaussian whose test_T = T·(1−α) < 1e-4
  is skipped and the pixel is done) needs NO cumulative-OR: test_T =
  tcarry·exp(Σ_{j≤k} log1p(−α_j)) and every log1p(−α) ≤ 0, so test_T is
  monotone non-increasing within a chunk — the per-position trigger is
  sticky by itself (saves one of the two forward triangular matmuls).
* The backward pass re-derives dL/dα with the prefix-sum identity
  dL/dα_i = T_i·(c_i·g) − (A_p − P_i)/(1−α_i), where A_p is computed from the
  forward outputs, so no per-Gaussian transmittance needs to be stored.
  Matches CUDA's convention of differentiating through the UNCLAMPED
  α = exp(q) even when the forward clamped at 0.99.

Inputs are pre-gathered per tile: tile_quad (T, K, 8) tile-local quadratic
coefficients, tile_color (T, K, 4) = [r, g, b, depth]. Dead/padded rows carry
log_op = −1e9 so they contribute exactly zero. tile_counts drives a dynamic
chunk-loop bound so mostly-empty tiles cost almost nothing.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
_TERM_EPS = 1e-4  # CUDA early-termination threshold on transmittance
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99

# jax's DEFAULT dot precision rounds f32 inputs to bf16 on the MXU. The
# quadratic evaluation q = basis @ quad cancels catastrophically (terms up
# to ~|c3|*px^2 ~ 1e3-1e4 summing to q ~ -10..0): bf16 input rounding
# corrupts q by O(1) log-density units = O(e) alpha error (caught as a
# dense-scene parity failure vs the sequential oracle; shallow unit scenes
# stayed inside tolerances and missed it). Per-site precision:
#  * q MUST be HIGHEST (cancellation; contraction depth 8 keeps it cheap);
#  * the triangular prefixes accumulate SAME-SIGN log terms (log1p(-a) <= 0,
#    w*cg >= 0 per chunk): bf16 input rounding bounds the relative error at
#    2^-9 of each term with no cancellation — <= ~0.2% on log-transmittance
#    (measured <= 1e-3 image error on the dense parity scene) at 6x the MXU
#    rate of HIGHEST, so they stay DEFAULT;
#  * gradient/image accumulators (acc, dquad, dcolor) keep HIGHEST: their
#    outputs are small ((P,4)/(G,8)/(G,4)) so multi-pass cost is minor, and
#    Mosaic only lowers DEFAULT/HIGHEST (Precision.HIGH is rejected).
_PREC_Q = jax.lax.Precision.HIGHEST
_PREC_PREFIX = jax.lax.Precision.DEFAULT
_PREC_GRAD = jax.lax.Precision.DEFAULT


def _dot(a, b, dims, prec):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=F32, precision=prec
    )


def _compiler_params(interpret: bool):
    """Raise the scoped-VMEM cap: the default 16 MiB rejects P=2048 tiles
    (the (P, chunk) body temporaries are lane-padded to 128 and there are
    ~14 of them live). v5e has 128 MiB of VMEM; the cap is a guard, not an
    allocation — small tiles are unaffected."""
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pixel_basis(th: int, tw: int) -> jnp.ndarray:
    """(P, 8) polynomial basis at tile-local pixel coords, row-major."""
    P = th * tw
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (i % tw).astype(F32)
    py = (i // tw).astype(F32)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate([one, px, py, px * px, px * py, py * py, zero, zero], 1)


def _tri_matrices(chunk: int):
    """Strictly-lower (j<i) and inclusive-lower (j<=i) (chunk,chunk) f32."""
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    excl = (j < i).astype(F32)
    incl = (j <= i).astype(F32)
    return excl, incl


def _pdot(x, m, prefix_dtype):
    """Prefix-sum matmul with optional reduced-precision inputs.

    The triangular prefix matmuls are ~97% of the composite FLOPs; bf16
    inputs double the MXU rate. Accumulation stays f32; the 0/1 triangular
    matrices are exact in bf16, so only x is rounded (<=0.4% rel)."""
    return jax.lax.dot_general(
        x.astype(prefix_dtype), m.astype(prefix_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=F32,
        precision=_PREC_PREFIX,
    )


def _localize(quad_g, ox, oy):
    """Tile-local quadratic coeffs from GLOBAL conic rows, inside the kernel.

    quad_g rows are [A, B, C, gx, gy, log_op, _, _] in global pixel coords
    (preprocess.ScreenGaussians.params). Same arithmetic as
    preprocess.pack_tile_quads — moved into the kernel because XLA lays the
    (T, K, 1) per-channel pack out with the size-1 dim on the 128-lane axis
    (1/128 VPU efficiency, ~60 ms/step at 1080p measured on v5e)."""
    A = quad_g[:, 0:1]
    B = quad_g[:, 1:2]
    C = quad_g[:, 2:3]
    gx = quad_g[:, 3:4] - ox
    gy = quad_g[:, 4:5] - oy
    L = quad_g[:, 5:6]
    c0 = -0.5 * (A * gx * gx + 2.0 * B * gx * gy + C * gy * gy) + L
    c1 = A * gx + B * gy
    c2 = B * gx + C * gy
    zero = jnp.zeros_like(L)
    return jnp.concatenate(
        [c0, c1, c2, -0.5 * A, -B, -0.5 * C, L, zero], axis=1
    )


def _pixel_basis_T(th: int, tw: int) -> jnp.ndarray:
    """(8, P) channel-major twin of _pixel_basis (for basisT @ dq)."""
    P = th * tw
    i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (i % tw).astype(F32)
    py = (i // tw).astype(F32)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate(
        [one, px, py, px * px, px * py, py * py, zero, zero], 0
    )


def _deloc_grads_T(gcT, qT, ox, oy):
    """Channel-major VJP of _localize: (8, G) local-coeff cotangents ->
    (8, G) global-row cotangents [dA,dB,dC,dgx,dgy,dL,0,0]. All slices are
    (1, G) — full 128-lane rows, unlike the (G, 1) columns of the row-major
    twin below. qT: (6, G) transposed global rows (A,B,C,gx,gy,log_op)."""
    g0, g1, g2 = gcT[0:1], gcT[1:2], gcT[2:3]
    g3, g4, g5 = gcT[3:4], gcT[4:5], gcT[5:6]
    A, B, C = qT[0:1], qT[1:2], qT[2:3]
    gxr = qT[3:4] - ox
    gyr = qT[4:5] - oy
    c1 = A * gxr + B * gyr
    c2 = B * gxr + C * gyr
    dA = g1 * gxr - 0.5 * g3 - 0.5 * g0 * (gxr * gxr)
    dB = g1 * gyr + g2 * gxr - g4 - g0 * (gxr * gyr)
    dC = g2 * gyr - 0.5 * g5 - 0.5 * g0 * (gyr * gyr)
    dgx = g1 * A + g2 * B - g0 * c1
    dgy = g1 * B + g2 * C - g0 * c2
    dL = g0
    zero = jnp.zeros_like(dL)
    return jnp.concatenate([dA, dB, dC, dgx, dgy, dL, zero, zero], 0)


def _deloc_grads(gc, quad_g, ox, oy):
    """VJP of _localize: cotangents w.r.t. local coeffs -> global rows."""
    g0 = gc[:, 0:1]
    g1 = gc[:, 1:2]
    g2 = gc[:, 2:3]
    g3 = gc[:, 3:4]
    g4 = gc[:, 4:5]
    g5 = gc[:, 5:6]
    A = quad_g[:, 0:1]
    B = quad_g[:, 1:2]
    C = quad_g[:, 2:3]
    gx = quad_g[:, 3:4] - ox
    gy = quad_g[:, 4:5] - oy
    c1 = A * gx + B * gy
    c2 = B * gx + C * gy
    dA = g1 * gx - 0.5 * g3 - 0.5 * g0 * gx * gx
    dB = g1 * gy + g2 * gx - g4 - g0 * gx * gy
    dC = g2 * gy - 0.5 * g5 - 0.5 * g0 * gy * gy
    dgx = g1 * A + g2 * B - g0 * c1
    dgy = g1 * B + g2 * C - g0 * c2
    dL = g0
    zero = jnp.zeros_like(dL)
    return jnp.concatenate([dA, dB, dC, dgx, dgy, dL, zero, zero], axis=1)


def _chunk_alphas(basis, quad, color=None):
    """Shared fwd/bwd chunk math: (alpha, alpha_unclamped_valid, q)."""
    # q[p, k] = basis[p, :] · quad[k, :6]
    q = _dot(basis, quad, ((1,), (1,)), _PREC_Q)  # (P, G)
    log_op = quad[:, 6].reshape(1, -1)
    return _alphas_from_q(q, log_op)


def _alphas_from_q(q, log_op):
    alpha_un = jnp.exp(q)
    valid = (q <= log_op) & (alpha_un >= _ALPHA_MIN)
    alpha = jnp.where(valid, jnp.minimum(alpha_un, _ALPHA_MAX), 0.0)
    alpha_un_valid = jnp.where(valid, alpha_un, 0.0)
    return alpha, alpha_un_valid


def _chunk_alphas_direct(pxg, pyg, quad_g):
    alpha, alpha_un, _ = _chunk_alphas_direct_t(pxg, pyg, quad_g)
    return alpha, alpha_un


def _chunk_alphas_direct_t(pxg, pyg, quad_g):
    """Direct VPU Mahalanobis evaluation from GLOBAL conic rows.

    q = log_op - 0.5·(A·dx² + 2B·dx·dy + C·dy²), dx = px_global - gx. All
    terms are O(conic·extent²) ~ O(10) — no cancellation, full f32, and no
    MXU matmul: replaces the (P,8)@(8,G) quadratic-coefficient product
    whose expanded c_i·px^i terms reach ~1e4 and demand 6-pass HIGHEST
    precision (~5 µs/chunk on v5e vs ~12 VPU sweeps ≈ 1.6 µs here).
    Also returns the (6, G) transposed rows for channel-major consumers."""
    qT = quad_g[:, :6].T  # (6, G); Mosaic 2D transpose, once per chunk
    A, B, C = qT[0:1], qT[1:2], qT[2:3]
    gx, gy, log_op = qT[3:4], qT[4:5], qT[5:6]
    dx = pxg - gx  # (P, 1) - (1, G) -> (P, G)
    dy = pyg - gy
    q = log_op - 0.5 * (A * (dx * dx) + C * (dy * dy)) - B * (dx * dy)
    alpha, alpha_un = _alphas_from_q(q, log_op)
    return alpha, alpha_un, qT


def _forward_kernel(
    count_ref,  # SMEM (1, 1, 1) int32
    quad_ref,  # VMEM (1, K, 8) — tile-local coeffs, or GLOBAL rows + origin
    color_ref,  # VMEM (1, K, 4)
    *rest,
    th: int,
    tw: int,
    K: int,
    chunk: int,
    localize: bool = False,
):
    if localize:
        origin_ref, accum_ref, tfinal_ref, acc, tcarry, done = rest
        ox = origin_ref[0, 0, 0]
        oy = origin_ref[0, 0, 1]
    else:
        accum_ref, tfinal_ref, acc, tcarry, done = rest
    P = th * tw
    basis = _pixel_basis(th, tw)
    m_excl, m_incl = _tri_matrices(chunk)
    if localize:
        # global pixel coords for the direct Mahalanobis evaluation
        pxg = basis[:, 1:2] + ox
        pyg = basis[:, 2:3] + oy

    acc[:] = jnp.zeros((P, 4), F32)
    tcarry[:] = jnp.ones((P, 1), F32)
    done[:] = jnp.zeros((P, 1), F32)

    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    def body(ci, _):
        # skip the chunk entirely once every pixel hit CUDA early
        # termination — renderCUDA's `done` break; opaque scenes terminate
        # after a few dozen Gaussians, so most of a deep tile's chunks skip.
        # (A manual unroll-by-2 interleaving two chunks' independent matmuls
        # was measured NEUTRAL on v5e — Mosaic does not overlap the streams
        # — so the simple form stays.)
        @pl.when(jnp.min(done[:]) < 1.0)
        def _compute():
            sl = pl.ds(ci * chunk, chunk)
            quad = quad_ref[0, sl, :]
            color = color_ref[0, sl, :]
            if localize:
                alpha, _ = _chunk_alphas_direct(pxg, pyg, quad)
            else:
                alpha, _ = _chunk_alphas(basis, quad)

            # raw prefix transmittance within chunk (exclusive), in log space
            wlog = jnp.log1p(-alpha)
            cum_excl = _dot(wlog, m_excl, ((1,), (0,)), _PREC_PREFIX)
            T_raw = jnp.exp(cum_excl) * tcarry[:]  # (P, G)

            # CUDA sticky early termination: first k with T·(1−α) < eps kills
            # the pixel from k onwards (inclusive). T_raw·(1−α) =
            # tcarry·exp(cum_incl) with cum_incl non-increasing, so the
            # trigger is sticky by itself — no cumulative-OR needed. Raw-T
            # triggers coincide with effective-T triggers up to the first
            # one, which is the only one that matters.
            trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
            dead = jnp.maximum(trigger, done[:])  # ≥1 → pixel done at this k
            alpha_eff = jnp.where(dead > 0.0, 0.0, alpha)

            w = alpha_eff * T_raw
            acc[:] += _dot(w, color, ((1,), (0,)), _PREC_GRAD)
            # done via a LAST-COLUMN SLICE, not a lane reduction:
            # stickiness makes dead[:, -1] == max_k dead. tcarry must use
            # the dead-MASKED wlog sum — tfinal is an output (CUDA reports
            # T at termination), and a raw-decayed carry drifts <= TERM_EPS
            # in a tile-grouping-dependent way (broke sharded-vs-unsharded
            # loss parity at 1e-4).
            wlog_eff = jnp.where(dead > 0.0, 0.0, wlog)
            tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
            done[:] = jnp.minimum(dead[:, -1:], 1.0)

    jax.lax.fori_loop(0, n_chunks, body, None, unroll=False)

    accum_ref[0] = acc[:]
    tfinal_ref[0] = tcarry[:]


def _backward_kernel(
    count_ref,  # SMEM (1, 1, 1) int32
    quad_ref,  # VMEM (1, K, 8) — tile-local coeffs, or GLOBAL rows + origin
    color_ref,  # VMEM (1, K, 4)
    gacc_ref,  # VMEM (1, P, 4) cotangent of accum
    gtf_ref,  # VMEM (1, P, 1) cotangent of tfinal
    atot_ref,  # VMEM (1, P, 1) A_p = g_acc·accum + g_tf·tfinal
    *rest,
    th: int,
    tw: int,
    K: int,
    chunk: int,
    localize: bool = False,
):
    if localize:
        origin_ref, dquad_ref, dcolor_ref, tcarry, pcarry, done = rest
        ox = origin_ref[0, 0, 0]
        oy = origin_ref[0, 0, 1]
    else:
        dquad_ref, dcolor_ref, tcarry, pcarry, done = rest
    P = th * tw
    basis = _pixel_basis(th, tw)
    m_excl, m_incl = _tri_matrices(chunk)
    if localize:
        pxg = basis[:, 1:2] + ox
        pyg = basis[:, 2:3] + oy

    tcarry[:] = jnp.ones((P, 1), F32)
    pcarry[:] = jnp.zeros((P, 1), F32)
    done[:] = jnp.zeros((P, 1), F32)
    dquad_ref[0] = jnp.zeros((K, 8), F32)
    dcolor_ref[0] = jnp.zeros((K, 4), F32)

    g_acc = gacc_ref[0]  # (P, 4)
    A_p = atot_ref[0]  # (P, 1)

    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    def body(ci, _):
        # dead chunks contribute zero gradient; dquad/dcolor were zeroed at
        # kernel start, so skipping the whole chunk is exact (see forward)
        @pl.when(jnp.min(done[:]) < 1.0)
        def _compute():
            sl = pl.ds(ci * chunk, chunk)
            quad_g = quad_ref[0, sl, :]
            color = color_ref[0, sl, :]
            if localize:
                alpha, alpha_un = _chunk_alphas_direct(pxg, pyg, quad_g)
            else:
                alpha, alpha_un = _chunk_alphas(basis, quad_g)

            wlog = jnp.log1p(-alpha)
            cum_excl = _dot(wlog, m_excl, ((1,), (0,)), _PREC_PREFIX)
            T_raw = jnp.exp(cum_excl) * tcarry[:]

            trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
            dead = jnp.maximum(trigger, done[:])  # sticky: see forward
            alive = dead == 0.0
            alpha_eff = jnp.where(alive, alpha, 0.0)
            w = alpha_eff * T_raw

            # cg[p, k] = color_k · g_acc_p
            # cg[p,g] = g_acc[p,:]·color[g,:] as 4 broadcast mul-adds on
            # the VPU — the (P,4)@(4,G) matmul's big (P,G) output makes
            # multi-pass MXU precision disproportionately expensive
            cT = color.T  # (4, G)
            cg = (g_acc[:, 0:1] * cT[0:1] + g_acc[:, 1:2] * cT[1:2]
                  + g_acc[:, 2:3] * cT[2:3] + g_acc[:, 3:4] * cT[3:4])
            wcg = w * cg
            P_incl = pcarry[:] + _dot(wcg, m_incl, ((1,), (0,)), _PREC_PREFIX)
            # dL/dα_i = T_i·cg_i − (A_p − P_i)/(1−α_i)
            dalpha = jnp.where(
                alive,
                T_raw * cg - (A_p - P_incl) / (1.0 - alpha_eff),
                0.0,
            )
            # CUDA convention: d(alpha)/d(q) = exp(q) even past the 0.99 clamp
            dq = dalpha * alpha_un  # (P, G)

            # accumulate parameter gradients on the MXU. NOTE: a channel-
            # major emission (basisT @ dq / g_accT @ w, avoiding the (P, G)
            # operand transposes, with small (C, G) output transposes back)
            # measured +2.5 ms in an isolated probe at chunk=256/K=1024 but
            # -19 ms in the product step at chunk=128/K=896 — the row-major
            # form stays (tools/kvariants.py bwd/noT).
            dquad_chunk = _dot(dq, basis, ((0,), (0,)), _PREC_GRAD)  # (G, 8)
            # zero the log_op lane (index 6): gradient flows via c0 only
            lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 1)
            dquad_chunk = jnp.where(lane == 6, 0.0, dquad_chunk)
            if localize:
                dquad_chunk = _deloc_grads(dquad_chunk, quad_g, ox, oy)
            dcolor_chunk = _dot(w, g_acc, ((0,), (0,)), _PREC_GRAD)  # (G, 4)
            dquad_ref[0, sl, :] = dquad_chunk
            dcolor_ref[0, sl, :] = dcolor_chunk

            # exact slice carries: P_incl's last column IS pcarry + sum(wcg)
            # (wcg is already dead-masked); done via stickiness (see fwd).
            # tcarry keeps the masked lane-sum — see the forward kernel.
            pcarry[:] = P_incl[:, -1:]
            wlog_eff = jnp.where(alive, wlog, 0.0)
            tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
            done[:] = jnp.minimum(dead[:, -1:], 1.0)

    jax.lax.fori_loop(0, n_chunks, body, None, unroll=False)

    # cotangent of tfinal: Tf = tcarry · Π — handled analytically:
    # dL/dα_i gets −g_tf·Tf/(1−α_i), already folded into A_p via
    # A_p = g_acc·accum + g_tf·tfinal (the Σ_{j>i} suffix identity).


# --------------------------------------------------------------------------
# Channel-major (CM) kernels — the product v1 path.
#
# XLA's TPU layout for Pallas custom-call operands/results tiles the two
# minormost dims as T(8,128); a minor dim of 4 or 1 therefore pads to 128
# lanes. The row-major boundary arrays this replaced were catastrophic:
# accum (T, P, 4) occupied 1020 MB for 32 MB of data (32x), tfinal
# (T, P, 1) 128x, the (T, K, 8/4) windows 16/32x — ~3 GB of dead HBM
# traffic per render and an OOM at train-step scale (5 renders). The CM
# boundary keeps every minor dim >= K or P:
#   win   (T, 12, K): rows [A,B,C,gx,gy,log_op,0,0, r,g,b,depth]
#   full  (T, 5, P):  rows [img_r,img_g,img_b, depth, mask] (bg composited
#                     IN-KERNEL; mask = 1 - tfinal)
#   dwin  (T, 12, K): rows [dA,dB,dC,dgx,dgy,dlog_op,0,0, dr,dg,db,dd]
# Sublane padding (12->16, 5->8) costs <= 1.6x instead of 32-128x.
# --------------------------------------------------------------------------


def _alphas_from_qT(pxg, pyg, qT):
    """Direct Mahalanobis evaluation from a (6, G) channel-major window.

    Same math as _chunk_alphas_direct_t, minus its per-chunk transpose —
    the CM window layout already has conic rows on sublanes."""
    A, B, C = qT[0:1], qT[1:2], qT[2:3]
    gx, gy, log_op = qT[3:4], qT[4:5], qT[5:6]
    dx = pxg - gx  # (P, 1) - (1, G) -> (P, G)
    dy = pyg - gy
    q = log_op - 0.5 * (A * (dx * dx) + C * (dy * dy)) - B * (dx * dy)
    return _alphas_from_q(q, log_op)


def _forward_kernel_cm(
    count_ref,  # SMEM (1, 1, 1) int32
    bg_ref,  # SMEM (1, 1, 3) f32
    win_ref,  # VMEM (1, 12, K)
    origin_ref,  # VMEM (1, 1, 2)
    out_ref,  # VMEM (1, 5, P)
    acc,  # scratch (Ps, 4)
    tcarry,  # scratch (Ps, 1)
    done,  # scratch (Ps, 1)
    *,
    th: int,
    tw: int,
    K: int,
    chunk: int,
    sub: int = 1,
):
    """``sub``: split the tile's P pixels into ``sub`` row groups, each with
    its OWN chunk loop and done-skip. Per-pixel arithmetic is untouched
    (compositing has no cross-pixel coupling), so outputs are bit-identical
    to sub=1 — but the sticky early termination now skips a chunk when a
    ROW GROUP is done instead of waiting for all th*tw pixels: termination
    depth is spatially coherent, and one straggler pixel previously forced
    the whole 32x128 tile through every live chunk. Binning stays at the
    full tile (pair count unchanged)."""
    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    P = th * tw
    assert P % sub == 0 and th % sub == 0, (P, th, sub)
    Ps = P // sub
    rh = th // sub  # pixel rows per sub-block
    m_excl, _ = _tri_matrices(chunk)
    i = jax.lax.broadcasted_iota(jnp.int32, (Ps, 1), 0)
    px0 = (i % tw).astype(F32) + ox
    py0 = (i // tw).astype(F32) + oy

    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    for s in range(sub):
        pxg = px0
        pyg = py0 + float(s * rh)
        acc[:] = jnp.zeros((Ps, 4), F32)
        tcarry[:] = jnp.ones((Ps, 1), F32)
        done[:] = jnp.zeros((Ps, 1), F32)

        def body(ci, _):
            @pl.when(jnp.min(done[:]) < 1.0)
            def _compute():
                sl = pl.ds(ci * chunk, chunk)
                wrow = win_ref[0, :, sl]  # (12, G)
                alpha, _ = _alphas_from_qT(pxg, pyg, wrow[0:6])

                wlog = jnp.log1p(-alpha)
                cum_excl = _dot(wlog, m_excl, ((1,), (0,)), _PREC_PREFIX)
                T_raw = jnp.exp(cum_excl) * tcarry[:]
                # sticky CUDA early termination — see _forward_kernel
                trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
                dead = jnp.maximum(trigger, done[:])
                # 0 * T_raw == 0 exactly: masking w directly equals the
                # alpha_eff formulation bit-for-bit, one sweep cheaper
                w = jnp.where(dead > 0.0, 0.0, alpha * T_raw)
                color = wrow[8:12].T  # (G, 4) — small per-chunk transpose
                acc[:] += _dot(w, color, ((1,), (0,)), _PREC_GRAD)
                wlog_eff = jnp.where(dead > 0.0, 0.0, wlog)
                tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
                done[:] = jnp.minimum(dead[:, -1:], 1.0)

        jax.lax.fori_loop(0, n_chunks, body, None, unroll=False)

        # emit (5, Ps) slice: rgb over bg, depth, mask = 1 - tfinal
        accT = acc[:].T  # (4, Ps)
        tfT = tcarry[:].T  # (1, Ps)
        out_ref[0, :, s * Ps:(s + 1) * Ps] = jnp.concatenate(
            [
                accT[0:1] + bg_ref[0, 0, 0] * tfT,
                accT[1:2] + bg_ref[0, 0, 1] * tfT,
                accT[2:3] + bg_ref[0, 0, 2] * tfT,
                accT[3:4],
                1.0 - tfT,
            ],
            axis=0,
        )


def _backward_kernel_cm(
    count_ref,  # SMEM (1, 1, 1) int32
    bg_ref,  # SMEM (1, 1, 3) f32
    win_ref,  # VMEM (1, 12, K)
    origin_ref,  # VMEM (1, 1, 2)
    full_ref,  # VMEM (1, 5, P) forward output (residual)
    gfull_ref,  # VMEM (1, 5, P) cotangent of full
    dwin_ref,  # out VMEM (1, 12, K)
    tcarry,
    pcarry,
    done,
    *,
    th: int,
    tw: int,
    K: int,
    chunk: int,
    sub: int = 1,
):
    """``sub``: per-row-group chunk loops with independent done-skip — see
    _forward_kernel_cm. Parameter gradients from the row groups ACCUMULATE
    into dwin (gradients sum over pixels); equals the sub=1 result up to f32
    summation order (the grad matmul's P-contraction splits into sub partial
    sums), and chunks past a group's termination contribute exact zeros."""
    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    P = th * tw
    assert P % sub == 0 and th % sub == 0, (P, th, sub)
    Ps = P // sub
    rh = th // sub
    m_excl, m_incl = _tri_matrices(chunk)
    i = jax.lax.broadcasted_iota(jnp.int32, (Ps, 1), 0)
    px0 = (i % tw).astype(F32) + ox
    py0 = (i // tw).astype(F32) + oy
    basisT_full = _pixel_basis_T(th, tw)  # (8, P) tile-local coords

    dwin_ref[0] = jnp.zeros((12, K), F32)

    bg0 = bg_ref[0, 0, 0]
    bg1 = bg_ref[0, 0, 1]
    bg2 = bg_ref[0, 0, 2]
    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    for s in range(sub):
        pxg = px0
        pyg = py0 + float(s * rh)
        psl = pl.ds(s * Ps, Ps)
        # tile-local basis columns for this row group: the deloc transform
        # is linear in the cotangents, so per-group deloc + f32 accumulation
        # equals the sub=1 single-matmul result up to summation order
        basisT = basisT_full[:, s * Ps:(s + 1) * Ps]
        tcarry[:] = jnp.ones((Ps, 1), F32)
        pcarry[:] = jnp.zeros((Ps, 1), F32)
        done[:] = jnp.zeros((Ps, 1), F32)

        # reconstruct accum/tfinal cotangents from the fused-output
        # cotangent: img = accum_rgb + tfinal*bg ; depth = accum_d ;
        # mask = 1 - tfinal
        gf = gfull_ref[0, :, psl]  # (5, Ps)
        ff = full_ref[0, :, psl]  # (5, Ps)
        tfT = 1.0 - ff[4:5]  # (1, Ps)
        g_accT = gf[0:4]  # (4, Ps): d/d accum == d/d full for rgb+depth
        g_tfT = bg0 * gf[0:1] + bg1 * gf[1:2] + bg2 * gf[2:3] - gf[4:5]
        acc0 = ff[0:1] - bg0 * tfT
        acc1 = ff[1:2] - bg1 * tfT
        acc2 = ff[2:3] - bg2 * tfT
        # A_p = g_acc·accum + g_tf·tfinal (per pixel)
        A_pT = (g_accT[0:1] * acc0 + g_accT[1:2] * acc1 + g_accT[2:3] * acc2
                + g_accT[3:4] * ff[3:4] + g_tfT * tfT)  # (1, Ps)
        A_p = A_pT.T  # (Ps, 1)
        g_acc = g_accT.T  # (Ps, 4) — for the cg broadcast sum

        def body(ci, _):
            @pl.when(jnp.min(done[:]) < 1.0)
            def _compute():
                sl = pl.ds(ci * chunk, chunk)
                wrow = win_ref[0, :, sl]  # (12, G)
                qT = wrow[0:6]
                colorT = wrow[8:12]  # (4, G)
                alpha, alpha_un = _alphas_from_qT(pxg, pyg, qT)

                wlog = jnp.log1p(-alpha)
                cum_excl = _dot(wlog, m_excl, ((1,), (0,)), _PREC_PREFIX)
                T_raw = jnp.exp(cum_excl) * tcarry[:]

                trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
                dead = jnp.maximum(trigger, done[:])
                alive = dead == 0.0
                alpha_eff = jnp.where(alive, alpha, 0.0)
                w = alpha_eff * T_raw

                # cg[p, g] = g_acc[p, :]·color[g, :] on the VPU (v1 kernel)
                cg = (g_acc[:, 0:1] * colorT[0:1] + g_acc[:, 1:2] * colorT[1:2]
                      + g_acc[:, 2:3] * colorT[2:3] + g_acc[:, 3:4] * colorT[3:4])
                wcg = w * cg
                P_incl = pcarry[:] + _dot(wcg, m_incl, ((1,), (0,)), _PREC_PREFIX)
                dalpha = jnp.where(
                    alive,
                    T_raw * cg - (A_p - P_incl) / (1.0 - alpha_eff),
                    0.0,
                )
                dq = dalpha * alpha_un  # (Ps, G)

                # channel-major grad emission: contraction over Ps hits dim
                # 0 of dq/w directly (no big transposes), outputs land in
                # the (12, K) row layout with NO output transposes
                dquadT = _dot(basisT, dq, ((1,), (0,)), _PREC_GRAD)  # (8, G)
                dquadT = _deloc_grads_T(dquadT, qT, ox, oy)
                dcolorT = _dot(g_accT, w, ((1,), (0,)), _PREC_GRAD)  # (4, G)
                contrib = jnp.concatenate([dquadT, dcolorT], axis=0)
                if sub == 1:
                    dwin_ref[0, :, sl] = contrib
                else:
                    dwin_ref[0, :, sl] += contrib

                pcarry[:] = P_incl[:, -1:]
                wlog_eff = jnp.where(alive, wlog, 0.0)
                tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
                done[:] = jnp.minimum(dead[:, -1:], 1.0)

        jax.lax.fori_loop(0, n_chunks, body, None, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "chunk", "interpret", "sub")
)
def composite_tiles_fwd_cm(
    win: jnp.ndarray,  # (T, 12, K) channel-major windows
    tile_counts: jnp.ndarray,  # (T,)
    tile_origins: jnp.ndarray,  # (T, 2)
    bg: jnp.ndarray,  # (3,)
    tile_shape: Tuple[int, int],
    chunk: int = 128,
    interpret: bool = False,
    sub: int = 1,
) -> jnp.ndarray:
    """Returns full (T, 5, P): [img_rgb (bg-composited), depth, mask].
    ``sub``: row-group early-termination granularity (bit-exact)."""
    T, _, K = win.shape
    th, tw = tile_shape
    P = th * tw
    Ps = P // sub
    kern = functools.partial(
        _forward_kernel_cm, th=th, tw=tw, K=K, chunk=chunk, sub=sub
    )
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 12, K), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 5, P), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 5, P), F32),
        scratch_shapes=[
            pltpu.VMEM((Ps, 4), F32),
            pltpu.VMEM((Ps, 1), F32),
            pltpu.VMEM((Ps, 1), F32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        tile_counts.reshape(T, 1, 1).astype(jnp.int32),
        bg.reshape(1, 1, 3).astype(F32),
        win,
        tile_origins.astype(F32).reshape(T, 1, 2),
    )


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "chunk", "interpret", "sub")
)
def composite_tiles_bwd_cm(
    win: jnp.ndarray,  # (T, 12, K)
    tile_counts: jnp.ndarray,
    tile_origins: jnp.ndarray,
    bg: jnp.ndarray,
    full: jnp.ndarray,  # (T, 5, P) forward output
    g_full: jnp.ndarray,  # (T, 5, P) cotangent
    tile_shape: Tuple[int, int],
    chunk: int = 128,
    interpret: bool = False,
    sub: int = 1,
) -> jnp.ndarray:
    """Returns dwin (T, 12, K) in the window row layout."""
    T, _, K = win.shape
    th, tw = tile_shape
    P = th * tw
    Ps = P // sub
    kern = functools.partial(
        _backward_kernel_cm, th=th, tw=tw, K=K, chunk=chunk, sub=sub
    )
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 3), lambda t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 12, K), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 5, P), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 5, P), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 12, K), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 12, K), F32),
        scratch_shapes=[
            pltpu.VMEM((Ps, 1), F32),
            pltpu.VMEM((Ps, 1), F32),
            pltpu.VMEM((Ps, 1), F32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        tile_counts.reshape(T, 1, 1).astype(jnp.int32),
        bg.reshape(1, 1, 3).astype(F32),
        win,
        tile_origins.astype(F32).reshape(T, 1, 2),
        full,
        g_full,
    )


# --------------------------------------------------------------------------
# v2: occupancy-aware chunked pipeline
#
# v1 DMAs the full (K, 8+4) window per tile even when the tile holds a
# handful of Gaussians (measured mean occupancy ~57% at 1080p/100k, and far
# lower for real avatars where most tiles are background). v2 grids over
# (T, K/chunk) with the per-tile counts scalar-prefetched into the BLOCK
# INDEX MAPS: chunks past ceil(count/chunk) clamp to the last live chunk, so
# the pipeline sees a repeated block index and skips the fetch entirely
# (Pallas block-revisiting). Compute for dead chunks is skipped with pl.when.
# The backward's (T, K, ·) gradient outputs are likewise only written for
# live chunks; dead regions stay UNINITIALIZED — their rows are sentinel
# (tile_indices == N) in the consumer's scatter-add, which drops row N.
# --------------------------------------------------------------------------


def _live_chunks(cnt, K, chunk):
    return pl.cdiv(jnp.minimum(cnt, K), chunk)


def _forward_kernel_v2(
    cnt_ref,  # scalar prefetch (T,) int32 SMEM
    quad_ref,  # VMEM (1, chunk, 8)
    color_ref,  # VMEM (1, chunk, 4)
    accum_ref,  # out VMEM (1, P, 4)
    tfinal_ref,  # out VMEM (1, P, 1)
    acc,
    tcarry,
    done,
    *,
    th: int,
    tw: int,
    K: int,
    chunk: int,
    prefix_dtype=F32,
):
    P = th * tw
    t = pl.program_id(0)
    ci = pl.program_id(1)
    NC = pl.num_programs(1)
    nc = _live_chunks(cnt_ref[t], K, chunk)

    basis = _pixel_basis(th, tw)
    m_excl, m_incl = _tri_matrices(chunk)

    @pl.when(ci == 0)
    def _init():
        acc[:] = jnp.zeros((P, 4), F32)
        tcarry[:] = jnp.ones((P, 1), F32)
        done[:] = jnp.zeros((P, 1), F32)

    # skip chunks once every pixel in the tile hit CUDA early termination
    @pl.when((ci < nc) & (jnp.min(done[:]) < 1.0))
    def _compute():
        quad = quad_ref[0]
        color = color_ref[0]
        alpha, _ = _chunk_alphas(basis, quad)

        wlog = jnp.log1p(-alpha)
        cum_excl = _pdot(wlog, m_excl, prefix_dtype)
        T_raw = jnp.exp(cum_excl) * tcarry[:]

        trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
        dead = jnp.maximum(trigger, done[:])  # sticky: see v1 forward
        alpha_eff = jnp.where(dead > 0.0, 0.0, alpha)

        w = alpha_eff * T_raw
        acc[:] += _dot(w, color, ((1,), (0,)), _PREC_GRAD)
        # done slice + masked tcarry sum — see the v1 forward kernel
        wlog_eff = jnp.where(dead > 0.0, 0.0, wlog)
        tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
        done[:] = jnp.minimum(dead[:, -1:], 1.0)

    @pl.when(ci == NC - 1)
    def _emit():
        accum_ref[0] = acc[:]
        tfinal_ref[0] = tcarry[:]


def _backward_kernel_v2(
    cnt_ref,  # scalar prefetch (T,) int32 SMEM
    quad_ref,  # VMEM (1, chunk, 8)
    color_ref,  # VMEM (1, chunk, 4)
    gacc_ref,  # VMEM (1, P, 4)
    atot_ref,  # VMEM (1, P, 1)
    dquad_ref,  # out VMEM (1, chunk, 8)
    dcolor_ref,  # out VMEM (1, chunk, 4)
    tcarry,
    pcarry,
    done,
    *,
    th: int,
    tw: int,
    K: int,
    chunk: int,
    prefix_dtype=F32,
):
    P = th * tw
    t = pl.program_id(0)
    ci = pl.program_id(1)
    nc = _live_chunks(cnt_ref[t], K, chunk)

    basis = _pixel_basis(th, tw)
    m_excl, m_incl = _tri_matrices(chunk)

    @pl.when(ci == 0)
    def _init():
        tcarry[:] = jnp.ones((P, 1), F32)
        pcarry[:] = jnp.zeros((P, 1), F32)
        done[:] = jnp.zeros((P, 1), F32)

    @pl.when(ci < nc)
    def _compute():
        quad = quad_ref[0]
        color = color_ref[0]
        g_acc = gacc_ref[0]
        A_p = atot_ref[0]
        alpha, alpha_un = _chunk_alphas(basis, quad)

        wlog = jnp.log1p(-alpha)
        cum_excl = _pdot(wlog, m_excl, prefix_dtype)
        T_raw = jnp.exp(cum_excl) * tcarry[:]

        trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
        dead = jnp.maximum(trigger, done[:])  # sticky: see v1 forward
        alive = dead == 0.0
        alpha_eff = jnp.where(alive, alpha, 0.0)
        w = alpha_eff * T_raw

        cT = color.T  # (4, G) — see v1: VPU outer-sum beats multi-pass MXU
        cg = (g_acc[:, 0:1] * cT[0:1] + g_acc[:, 1:2] * cT[1:2]
              + g_acc[:, 2:3] * cT[2:3] + g_acc[:, 3:4] * cT[3:4])
        wcg = w * cg
        P_incl = pcarry[:] + _pdot(wcg, m_incl, prefix_dtype)
        dalpha = jnp.where(
            alive,
            T_raw * cg - (A_p - P_incl) / (1.0 - alpha_eff),
            0.0,
        )
        dq = dalpha * alpha_un

        dquad_chunk = _dot(dq, basis, ((0,), (0,)), _PREC_GRAD)
        lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 1)
        dquad_chunk = jnp.where(lane == 6, 0.0, dquad_chunk)
        dcolor_chunk = _dot(w, g_acc, ((0,), (0,)), _PREC_GRAD)
        dquad_ref[0] = dquad_chunk
        dcolor_ref[0] = dcolor_chunk

        # exact slice carries — see the v1 kernels
        pcarry[:] = P_incl[:, -1:]
        wlog_eff = jnp.where(alive, wlog, 0.0)
        tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
        done[:] = jnp.minimum(dead[:, -1:], 1.0)


def _chunk_idx(ci, cnt, K, chunk):
    """Clamp chunk index to the last live chunk (repeat -> no refetch)."""
    nc = _live_chunks(cnt, K, chunk)
    return jnp.minimum(ci, jnp.maximum(nc - 1, 0))


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "chunk", "interpret", "prefix_bf16")
)
def composite_tiles_fwd_v2(
    tile_quad: jnp.ndarray,
    tile_color: jnp.ndarray,
    tile_counts: jnp.ndarray,
    tile_shape: Tuple[int, int],
    chunk: int = 128,
    interpret: bool = False,
    prefix_bf16: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    T, K, _ = tile_quad.shape
    th, tw = tile_shape
    P = th * tw
    assert K % chunk == 0, (K, chunk)
    NC = K // chunk
    kern = functools.partial(
        _forward_kernel_v2, th=th, tw=tw, K=K, chunk=chunk,
        prefix_dtype=jnp.bfloat16 if prefix_bf16 else F32,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, NC),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, 8),
                lambda t, ci, cnt: (t, _chunk_idx(ci, cnt[t], K, chunk), 0),
            ),
            pl.BlockSpec(
                (1, chunk, 4),
                lambda t, ci, cnt: (t, _chunk_idx(ci, cnt[t], K, chunk), 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, P, 4), lambda t, ci, cnt: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, ci, cnt: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 4), F32),
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P, 4), F32),
            jax.ShapeDtypeStruct((T, P, 1), F32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(tile_counts.astype(jnp.int32), tile_quad, tile_color)


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "chunk", "interpret", "prefix_bf16")
)
def composite_tiles_bwd_v2(
    tile_quad: jnp.ndarray,
    tile_color: jnp.ndarray,
    tile_counts: jnp.ndarray,
    g_accum: jnp.ndarray,
    g_tfinal: jnp.ndarray,
    accum: jnp.ndarray,
    tfinal: jnp.ndarray,
    tile_shape: Tuple[int, int],
    chunk: int = 128,
    interpret: bool = False,
    prefix_bf16: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gradients for live chunks only; dead (T, K) regions are UNWRITTEN
    (consumers must route those rows to a dropped sentinel)."""
    T, K, _ = tile_quad.shape
    th, tw = tile_shape
    P = th * tw
    assert K % chunk == 0, (K, chunk)
    NC = K // chunk
    a_tot = jnp.sum(g_accum * accum, axis=-1, keepdims=True) + g_tfinal * tfinal
    kern = functools.partial(
        _backward_kernel_v2, th=th, tw=tw, K=K, chunk=chunk,
        prefix_dtype=jnp.bfloat16 if prefix_bf16 else F32,
    )
    chunk_map = lambda t, ci, cnt: (t, _chunk_idx(ci, cnt[t], K, chunk), 0)
    tile_map = lambda t, ci, cnt: (t, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, NC),
        in_specs=[
            pl.BlockSpec((1, chunk, 8), chunk_map),
            pl.BlockSpec((1, chunk, 4), chunk_map),
            pl.BlockSpec((1, P, 4), tile_map),
            pl.BlockSpec((1, P, 1), tile_map),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, 8), chunk_map),
            pl.BlockSpec((1, chunk, 4), chunk_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, K, 8), F32),
            jax.ShapeDtypeStruct((T, K, 4), F32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        tile_counts.astype(jnp.int32),
        tile_quad,
        tile_color,
        g_accum,
        a_tot,
    )


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "chunk", "interpret")
)
def composite_tiles_fwd(
    tile_quad: jnp.ndarray,
    tile_color: jnp.ndarray,
    tile_counts: jnp.ndarray,
    tile_shape: Tuple[int, int],
    chunk: int = 128,
    interpret: bool = False,
    tile_origins: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tile_origins (T, 2) f32: when given, tile_quad rows are GLOBAL conic
    params and the tile-local packing happens inside the kernel (the fast
    path — see _localize); when None, rows are pre-packed local coeffs."""
    T, K, _ = tile_quad.shape
    th, tw = tile_shape
    P = th * tw
    localize = tile_origins is not None
    kern = functools.partial(
        _forward_kernel, th=th, tw=tw, K=K, chunk=chunk, localize=localize
    )
    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, K, 4), lambda t: (t, 0, 0)),
    ]
    args = [tile_counts.reshape(T, 1, 1).astype(jnp.int32), tile_quad, tile_color]
    if localize:
        # (T, 1, 2) with block (1, 1, 2): last-two dims equal the array's,
        # satisfying the (8, 128)-or-full Pallas TPU block rule
        in_specs.append(pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0)))
        args.append(tile_origins.astype(F32).reshape(T, 1, 2))
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, P, 4), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, P, 4), F32),
            jax.ShapeDtypeStruct((T, P, 1), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 4), F32),
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*args)


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "chunk", "interpret")
)
def composite_tiles_bwd(
    tile_quad: jnp.ndarray,
    tile_color: jnp.ndarray,
    tile_counts: jnp.ndarray,
    g_accum: jnp.ndarray,
    g_tfinal: jnp.ndarray,
    accum: jnp.ndarray,
    tfinal: jnp.ndarray,
    tile_shape: Tuple[int, int],
    chunk: int = 128,
    interpret: bool = False,
    tile_origins: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """With tile_origins set, consumes GLOBAL conic rows and returns
    gradients in the GLOBAL row layout [dA,dB,dC,dgx,dgy,dlog_op,0,0]."""
    T, K, _ = tile_quad.shape
    th, tw = tile_shape
    P = th * tw
    localize = tile_origins is not None
    # A_p = g_acc·accum + g_tf·tfinal (total downstream weight per pixel)
    a_tot = jnp.sum(g_accum * accum, axis=-1, keepdims=True) + g_tfinal * tfinal
    kern = functools.partial(
        _backward_kernel, th=th, tw=tw, K=K, chunk=chunk, localize=localize
    )
    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, K, 4), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, P, 4), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
        pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
    ]
    args = [
        tile_counts.reshape(T, 1, 1).astype(jnp.int32),
        tile_quad,
        tile_color,
        g_accum,
        g_tfinal,
        a_tot,
    ]
    if localize:
        in_specs.append(pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0)))
        args.append(tile_origins.astype(F32).reshape(T, 1, 2))
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, K, 4), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, K, 8), F32),
            jax.ShapeDtypeStruct((T, K, 4), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*args)


# --------------------------------------------------------------------------
# ragged (pair-major) channel-major kernels
# --------------------------------------------------------------------------
#
# The dense CM kernels DMA one (12, K) window per tile, so HBM traffic and
# table memory scale as T·K even when most slots are sentinel padding — at
# reference-density avatar scale (164k-Gaussian human at 1080p) the
# zero-truncation capacity is K ≈ 16384 and the dense step spends most of
# its time moving empty window slots (measured 2.42 s/itr vs 1.04 at a
# truncating K=1024, tools/train_step_bench.py --steady). These kernels
# instead stream a CHUNK-ALIGNED PAIR LIST (binning.bin_gaussians_ragged):
# grid = one step per chunk SLOT, with scalar-prefetched per-slot tile ids
# driving the output block index — the TPU analog of CUDA's dynamic
# per-tile ranges (diff-gaussian-rasterization's ranges buffer). Work,
# memory, and DMA all scale with the LIVE pair count; per-tile capacity
# (and its truncation failure mode) ceases to exist.
#
# Grid-revisit contract: consecutive slots of one tile map to the same
# output block, so Mosaic keeps it in VMEM and flushes on tile change;
# every tile owns >= 1 slot (empty tiles emit pure background).


def _forward_kernel_rg(
    tid_ref,  # scalar prefetch (NC,) int32: tile id per chunk slot
    flag_ref,  # scalar prefetch (NC,) int32: bit0 first, bit1 last, bit2 valid
    bg_ref,  # SMEM (1, 3)
    oy_ref,  # SMEM (1, 1) f32: global row offset of tile row 0 (sharded band)
    rows_ref,  # VMEM (12, chunk) — this slot's pair rows, channel-major
    out_ref,  # out VMEM (1, 5, P)
    acc,  # scratch (P, 4)
    tcarry,  # scratch (P, 1)
    done,  # scratch (P, 1)
    *,
    th: int,
    tw: int,
    chunk: int,
    nx: int,
):
    j = pl.program_id(0)
    t = tid_ref[j]
    flags = flag_ref[j]
    P = th * tw
    m_excl, _ = _tri_matrices(chunk)
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    ox = ((t % nx) * tw).astype(F32)
    oy = ((t // nx) * th).astype(F32) + oy_ref[0, 0]
    pxg = (i % tw).astype(F32) + ox
    pyg = (i // tw).astype(F32) + oy

    @pl.when((flags & 1) != 0)
    def _init():
        acc[:] = jnp.zeros((P, 4), F32)
        tcarry[:] = jnp.ones((P, 1), F32)
        done[:] = jnp.zeros((P, 1), F32)

    @pl.when(((flags & 4) != 0) & (jnp.min(done[:]) < 1.0))
    def _compute():
        wrow = rows_ref[:, :]  # (12, G)
        alpha, _ = _alphas_from_qT(pxg, pyg, wrow[0:6])
        wlog = jnp.log1p(-alpha)
        cum_excl = _dot(wlog, m_excl, ((1,), (0,)), _PREC_PREFIX)
        T_raw = jnp.exp(cum_excl) * tcarry[:]
        trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
        dead = jnp.maximum(trigger, done[:])
        w = jnp.where(dead > 0.0, 0.0, alpha * T_raw)
        color = wrow[8:12].T  # (G, 4)
        acc[:] += _dot(w, color, ((1,), (0,)), _PREC_GRAD)
        wlog_eff = jnp.where(dead > 0.0, 0.0, wlog)
        tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
        done[:] = jnp.minimum(dead[:, -1:], 1.0)

    @pl.when((flags & 2) != 0)
    def _emit():
        accT = acc[:].T  # (4, P)
        tfT = tcarry[:].T  # (1, P)
        out_ref[0] = jnp.concatenate(
            [
                accT[0:1] + bg_ref[0, 0] * tfT,
                accT[1:2] + bg_ref[0, 1] * tfT,
                accT[2:3] + bg_ref[0, 2] * tfT,
                accT[3:4],
                1.0 - tfT,
            ],
            axis=0,
        )


def _backward_kernel_rg(
    tid_ref,  # scalar prefetch (NC,) int32
    flag_ref,  # scalar prefetch (NC,) int32
    bg_ref,  # SMEM (1, 3)
    oy_ref,  # SMEM (1, 1)
    rows_ref,  # VMEM (12, chunk)
    full_ref,  # VMEM (1, 5, P) forward output of this slot's tile
    gfull_ref,  # VMEM (1, 5, P) cotangent
    dwin_ref,  # out VMEM (12, chunk)
    tcarry,
    pcarry,
    done,  # (P, 1): per-PIXEL sticky termination (groups read their slice)
    gacc_s,  # scratch (P, 4): per-tile g_acc, built at the first slot
    gaccT_s,  # scratch (4, P)
    A_p_s,  # scratch (P, 1)
    *,
    th: int,
    tw: int,
    chunk: int,
    nx: int,
    sub: int = 1,
):
    """``sub``: the tile's P pixels run as ``sub`` independent row groups,
    each skipping chunk slots once ITS pixels all terminated (same contract
    as _backward_kernel_cm — exact zeros past a group's termination depth,
    parameter grads accumulate over groups up to f32 summation order).
    With one chunk per grid step the skip saves the group's share of every
    remaining slot's compute; the slot DMA is shared and still happens."""
    j = pl.program_id(0)
    t = tid_ref[j]
    flags = flag_ref[j]
    P = th * tw
    assert P % sub == 0 and th % sub == 0, (P, th, sub)
    Ps = P // sub
    rh = th // sub
    m_excl, m_incl = _tri_matrices(chunk)
    i = jax.lax.broadcasted_iota(jnp.int32, (Ps, 1), 0)
    ox = ((t % nx) * tw).astype(F32)
    oy = ((t // nx) * th).astype(F32) + oy_ref[0, 0]
    px0 = (i % tw).astype(F32) + ox
    py0 = (i // tw).astype(F32) + oy
    basisT_full = _pixel_basis_T(th, tw)  # (8, P) tile-local coords

    @pl.when((flags & 1) != 0)
    def _init():
        tcarry[:] = jnp.ones((P, 1), F32)
        pcarry[:] = jnp.zeros((P, 1), F32)
        done[:] = jnp.zeros((P, 1), F32)
        # reconstruct accum/tfinal cotangents from the fused output (same
        # algebra as _backward_kernel_cm's per-group preamble)
        gf = gfull_ref[0]  # (5, P)
        ff = full_ref[0]
        bg0 = bg_ref[0, 0]
        bg1 = bg_ref[0, 1]
        bg2 = bg_ref[0, 2]
        tfT = 1.0 - ff[4:5]
        g_accT = gf[0:4]
        g_tfT = bg0 * gf[0:1] + bg1 * gf[1:2] + bg2 * gf[2:3] - gf[4:5]
        acc0 = ff[0:1] - bg0 * tfT
        acc1 = ff[1:2] - bg1 * tfT
        acc2 = ff[2:3] - bg2 * tfT
        A_pT = (g_accT[0:1] * acc0 + g_accT[1:2] * acc1 + g_accT[2:3] * acc2
                + g_accT[3:4] * ff[3:4] + g_tfT * tfT)  # (1, P)
        gaccT_s[:] = g_accT
        gacc_s[:] = g_accT.T
        A_p_s[:] = A_pT.T

    valid = (flags & 4) != 0
    dwin_ref[:, :] = jnp.zeros((12, chunk), F32)

    for s in range(sub):
        psl = pl.ds(s * Ps, Ps)
        live = valid & (jnp.min(done[psl, 0]) < 1.0)

        @pl.when(live)
        def _compute(s=s, psl=psl):
            pxg = px0
            pyg = py0 + float(s * rh)
            basisT = basisT_full[:, s * Ps:(s + 1) * Ps]
            wrow = rows_ref[:, :]
            qT = wrow[0:6]
            colorT = wrow[8:12]
            g_acc = gacc_s[psl, :]
            A_p = A_p_s[psl, :]
            alpha, alpha_un = _alphas_from_qT(pxg, pyg, qT)

            wlog = jnp.log1p(-alpha)
            cum_excl = _dot(wlog, m_excl, ((1,), (0,)), _PREC_PREFIX)
            T_raw = jnp.exp(cum_excl) * tcarry[psl, :]
            trigger = ((T_raw * (1.0 - alpha)) < _TERM_EPS).astype(F32)
            dead = jnp.maximum(trigger, done[psl, :])
            alive = dead == 0.0
            alpha_eff = jnp.where(alive, alpha, 0.0)
            w = alpha_eff * T_raw

            cg = (g_acc[:, 0:1] * colorT[0:1] + g_acc[:, 1:2] * colorT[1:2]
                  + g_acc[:, 2:3] * colorT[2:3] + g_acc[:, 3:4] * colorT[3:4])
            wcg = w * cg
            P_incl = pcarry[psl, :] + _dot(
                wcg, m_incl, ((1,), (0,)), _PREC_PREFIX
            )
            dalpha = jnp.where(
                alive,
                T_raw * cg - (A_p - P_incl) / (1.0 - alpha_eff),
                0.0,
            )
            dq = dalpha * alpha_un  # (Ps, G)

            dquadT = _dot(basisT, dq, ((1,), (0,)), _PREC_GRAD)  # (8, G)
            dquadT = _deloc_grads_T(dquadT, qT, ox, oy)
            dcolorT = _dot(
                gaccT_s[:, psl], w, ((1,), (0,)), _PREC_GRAD
            )  # (4, G)
            dwin_ref[:, :] += jnp.concatenate([dquadT, dcolorT], axis=0)

            pcarry[psl, :] = P_incl[:, -1:]
            wlog_eff = jnp.where(alive, wlog, 0.0)
            tcarry[psl, :] *= jnp.exp(
                jnp.sum(wlog_eff, axis=1, keepdims=True)
            )
            done[psl, :] = jnp.minimum(dead[:, -1:], 1.0)


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "num_tiles", "chunk", "nx",
                              "interpret")
)
def composite_pairs_fwd_rg(
    rows: jnp.ndarray,  # (12, Pa) chunk-aligned pair rows, channel-major
    tid: jnp.ndarray,  # (NC,) int32 tile id per chunk slot
    flags: jnp.ndarray,  # (NC,) int32 bit0 first / bit1 last / bit2 valid
    bg: jnp.ndarray,  # (3,)
    oy_off: jnp.ndarray,  # () f32 global row offset (0 off the sharded band)
    tile_shape: Tuple[int, int],
    num_tiles: int,
    chunk: int,
    nx: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns full (T, 5, P): [bg-composited rgb, depth, mask]."""
    th, tw = tile_shape
    P = th * tw
    NC = tid.shape[0]
    assert rows.shape[1] == NC * chunk, (rows.shape, NC, chunk)
    kern = functools.partial(
        _forward_kernel_rg, th=th, tw=tw, chunk=chunk, nx=nx
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda j, tid, flg: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j, tid, flg: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((12, chunk), lambda j, tid, flg: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, 5, P), lambda j, tid, flg: (tid[j], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((P, 4), F32),
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 5, P), F32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        tid.astype(jnp.int32),
        flags.astype(jnp.int32),
        bg.reshape(1, 3).astype(F32),
        jnp.reshape(oy_off, (1, 1)).astype(F32),
        rows,
    )


@functools.partial(
    jax.jit, static_argnames=("tile_shape", "num_tiles", "chunk", "nx",
                              "interpret", "sub")
)
def composite_pairs_bwd_rg(
    rows: jnp.ndarray,  # (12, Pa)
    tid: jnp.ndarray,  # (NC,)
    flags: jnp.ndarray,  # (NC,)
    bg: jnp.ndarray,  # (3,)
    oy_off: jnp.ndarray,  # ()
    full: jnp.ndarray,  # (T, 5, P)
    g_full: jnp.ndarray,  # (T, 5, P)
    tile_shape: Tuple[int, int],
    num_tiles: int,
    chunk: int,
    nx: int,
    interpret: bool = False,
    sub: int = 1,
) -> jnp.ndarray:
    """Returns dwin (12, Pa) — cotangents of the pair rows."""
    th, tw = tile_shape
    P = th * tw
    NC = tid.shape[0]
    kern = functools.partial(
        _backward_kernel_rg, th=th, tw=tw, chunk=chunk, nx=nx, sub=sub
    )
    tile_map = lambda j, tid, flg: (tid[j], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda j, tid, flg: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda j, tid, flg: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((12, chunk), lambda j, tid, flg: (0, j)),
            pl.BlockSpec((1, 5, P), tile_map),
            pl.BlockSpec((1, 5, P), tile_map),
        ],
        out_specs=pl.BlockSpec((12, chunk), lambda j, tid, flg: (0, j)),
        scratch_shapes=[
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 1), F32),
            pltpu.VMEM((P, 4), F32),
            pltpu.VMEM((4, P), F32),
            pltpu.VMEM((P, 1), F32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((12, NC * chunk), F32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(
        tid.astype(jnp.int32),
        flags.astype(jnp.int32),
        bg.reshape(1, 3).astype(F32),
        jnp.reshape(oy_off, (1, 1)).astype(F32),
        rows,
        full,
        g_full,
    )
