"""Kernel-internals attribution probe: times MODIFIED copies of the v1
composite kernels with individual cost groups stubbed out (results are
wrong on purpose — only the timing matters):

  fwd/base     — faithful copy of pallas_kernels._forward_kernel (localize)
  fwd/noexp    — exp/log1p replaced by cheap polynomials (VPU transcendental
                 cost removed, same dataflow)
  fwd/nomm     — triangular prefix matmul removed (cum := wlog)
  fwd/noskip   — done-skip pl.when removed (measures the skip's value)
  bwd/base     — faithful copy of _backward_kernel (localize)
  bwd/noexp    — transcendentals stubbed
  bwd/nomm     — BOTH prefix matmuls removed
  bwd/nograd   — dquad/dcolor MXU matmuls removed (writes zeros)
  bwd/fusedgrad— dquad+dcolor emitted from ONE stacked (P,2G)@(P,12) matmul
  bwd/noT      — grad matmuls as basisT@dq / gaccT@w: contraction stays on
                 dim 0 of the big (P,G) operands WITHOUT Mosaic transposing
                 them; only small (C,G) outputs transpose back (EXACT)
  bwd/nodeloc  — _deloc_grads skipped (isolates its (G,1)-sliced VPU cost)
  fwd/logsp    — log-space carry/trigger + fused w = exp(qc+cum+tlog) (EXACT
                 up to fp assoc; parity-checked)
  bwd/logsp    — same reformulation in the backward (EXACT)
  fwd/pipe     — software-pipelined: chunk ci+1's carry-INdependent front
                 (alpha, wlog, prefix matmul) is computed in the same loop
                 body as chunk ci's carry-dependent tail, exposing MXU/VPU
                 ILP to the Mosaic scheduler (EXACT; carries (P,G) values
                 across iterations in VMEM)
  bwd/pipe     — same for the backward (front also precomputes cg)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/kvariants.py
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exavatar_release_tpu.ops.rasterizer import pallas_kernels as PK

F32 = jnp.float32


def _exp(x, stub):
    return x * 0.25 + 1.0 if stub else jnp.exp(x)


def _log1p(x, stub):
    return x * 0.5 if stub else jnp.log1p(x)


def _pixel_basis_T(th, tw):
    """(8, P) polynomial basis — channel-major twin of PK._pixel_basis."""
    P = th * tw
    i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (i % tw).astype(F32)
    py = (i // tw).astype(F32)
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return jnp.concatenate([one, px, py, px * px, px * py, py * py, zero, zero], 0)


def _deloc_grads_T(gcT, A, B, C, gxr, gyr):
    """Channel-major VJP of _localize: (8, G) local-coeff cotangents ->
    (8, G) global-row cotangents. All slices are (1, G) — full lanes."""
    g0, g1, g2 = gcT[0:1], gcT[1:2], gcT[2:3]
    g3, g4, g5 = gcT[3:4], gcT[4:5], gcT[5:6]
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


def _fwd_kernel(count_ref, quad_ref, color_ref, origin_ref, accum_ref,
                tfinal_ref, acc, tcarry, done, *, th, tw, K, chunk,
                noexp=False, nomm=False, noskip=False, logsp=False):
    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    P = th * tw
    basis = PK._pixel_basis(th, tw)
    m_excl, _ = PK._tri_matrices(chunk)
    pxg = basis[:, 1:2] + ox
    pyg = basis[:, 2:3] + oy

    acc[:] = jnp.zeros((P, 4), F32)
    tcarry[:] = jnp.zeros((P, 1), F32) if logsp else jnp.ones((P, 1), F32)
    done[:] = jnp.zeros((P, 1), F32)
    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    def body(ci, _):
        cond = jnp.float32(0.0) if noskip else jnp.min(done[:])

        @pl.when(cond < 1.0)
        def _compute():
            sl = pl.ds(ci * chunk, chunk)
            quad = quad_ref[0, sl, :]
            color = color_ref[0, sl, :]
            qT = quad[:, :6].T
            A, B, C = qT[0:1], qT[1:2], qT[2:3]
            gx, gy, log_op = qT[3:4], qT[4:5], qT[5:6]
            dx = pxg - gx
            dy = pyg - gy
            q = log_op - 0.5 * (A * (dx * dx) + C * (dy * dy)) - B * (dx * dy)
            alpha_un = _exp(q, noexp)
            valid = (q <= log_op) & (alpha_un >= 1.0 / 255.0)
            alpha = jnp.where(valid, jnp.minimum(alpha_un, 0.99), 0.0)

            wlog = _log1p(-alpha, noexp)
            if nomm:
                cum_excl = wlog
            else:
                cum_excl = PK._dot(wlog, m_excl, ((1,), (0,)), PK._PREC_PREFIX)
            if logsp:
                # fused weight exponent: w = alpha_eff·T_raw =
                # exp(qc + cum_excl + tlog); trigger compares in LOG space
                targ = cum_excl + tcarry[:]
                trigger = ((targ + wlog) < -9.210340371976182).astype(F32)
                dead = jnp.maximum(trigger, done[:])
                qc = jnp.where(valid, jnp.minimum(q, -0.01005033585350145), -50.0)
                warg = jnp.where(dead > 0.0, -50.0, qc + targ)
                w = _exp(warg, noexp)
            else:
                T_raw = _exp(cum_excl, noexp) * tcarry[:]
                trigger = ((T_raw * (1.0 - alpha)) < 1e-4).astype(F32)
                dead = jnp.maximum(trigger, done[:])
                alpha_eff = jnp.where(dead > 0.0, 0.0, alpha)
                w = alpha_eff * T_raw
            acc[:] += PK._dot(w, color, ((1,), (0,)), PK._PREC_GRAD)
            wlog_eff = jnp.where(dead > 0.0, 0.0, wlog)
            if logsp:
                tcarry[:] += jnp.sum(wlog_eff, axis=1, keepdims=True)
            else:
                tcarry[:] *= _exp(
                    jnp.sum(wlog_eff, axis=1, keepdims=True), noexp)
            done[:] = jnp.minimum(dead[:, -1:], 1.0)

    jax.lax.fori_loop(0, n_chunks, body, None, unroll=False)
    accum_ref[0] = acc[:]
    tfinal_ref[0] = _exp(tcarry[:], False) if logsp else tcarry[:]


def _bwd_kernel(count_ref, quad_ref, color_ref, gacc_ref, gtf_ref, atot_ref,
                origin_ref, dquad_ref, dcolor_ref, tcarry, pcarry, done, *,
                th, tw, K, chunk, noexp=False, nomm=False, nograd=False,
                fusedgrad=False, noT=False, nodeloc=False, logsp=False):
    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    P = th * tw
    basis = PK._pixel_basis(th, tw)
    m_excl, m_incl = PK._tri_matrices(chunk)
    pxg = basis[:, 1:2] + ox
    pyg = basis[:, 2:3] + oy

    # logsp: the tcarry scratch holds LOG transmittance (init 0, += sums)
    tcarry[:] = jnp.zeros((P, 1), F32) if logsp else jnp.ones((P, 1), F32)
    pcarry[:] = jnp.zeros((P, 1), F32)
    done[:] = jnp.zeros((P, 1), F32)
    dquad_ref[0] = jnp.zeros((K, 8), F32)
    dcolor_ref[0] = jnp.zeros((K, 4), F32)
    g_acc = gacc_ref[0]
    if noT:
        basisT = _pixel_basis_T(th, tw)
        g_accT = g_acc.T  # (4, P), once per tile
    A_p = atot_ref[0]
    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    def body(ci, _):
        @pl.when(jnp.min(done[:]) < 1.0)
        def _compute():
            sl = pl.ds(ci * chunk, chunk)
            quad_g = quad_ref[0, sl, :]
            color = color_ref[0, sl, :]
            qT = quad_g[:, :6].T
            A, B, C = qT[0:1], qT[1:2], qT[2:3]
            gx, gy, log_op = qT[3:4], qT[4:5], qT[5:6]
            dxp = pxg - gx
            dyp = pyg - gy
            q = log_op - 0.5 * (A * (dxp * dxp) + C * (dyp * dyp)) - B * (dxp * dyp)
            alpha_un0 = _exp(q, noexp)
            valid = (q <= log_op) & (alpha_un0 >= 1.0 / 255.0)
            alpha = jnp.where(valid, jnp.minimum(alpha_un0, 0.99), 0.0)
            alpha_un = jnp.where(valid, alpha_un0, 0.0)

            wlog = _log1p(-alpha, noexp)
            if nomm:
                cum_excl = wlog
            else:
                cum_excl = PK._dot(wlog, m_excl, ((1,), (0,)), PK._PREC_PREFIX)
            if logsp:
                targ = cum_excl + tcarry[:]
                T_raw = _exp(targ, noexp)
                trigger = ((targ + wlog) < -9.210340371976182).astype(F32)
            else:
                T_raw = _exp(cum_excl, noexp) * tcarry[:]
                trigger = ((T_raw * (1.0 - alpha)) < 1e-4).astype(F32)
            dead = jnp.maximum(trigger, done[:])
            alive = dead == 0.0
            alpha_eff = jnp.where(alive, alpha, 0.0)
            w = alpha_eff * T_raw

            cT = color.T
            cg = (g_acc[:, 0:1] * cT[0:1] + g_acc[:, 1:2] * cT[1:2]
                  + g_acc[:, 2:3] * cT[2:3] + g_acc[:, 3:4] * cT[3:4])
            wcg = w * cg
            if nomm:
                P_incl = pcarry[:] + wcg
            else:
                P_incl = pcarry[:] + PK._dot(
                    wcg, m_incl, ((1,), (0,)), PK._PREC_PREFIX)
            dalpha = jnp.where(
                alive, T_raw * cg - (A_p - P_incl) / (1.0 - alpha_eff), 0.0)
            dq = dalpha * alpha_un

            if nograd:
                pass
            elif noT:
                # (8,P)@(P,G) and (4,P)@(P,G): the big operands are consumed
                # in standard (K-dim = their dim 0... no) form — contraction
                # is over dim 1 of basisT/g_accT and dim 0 of dq/w, so NO
                # physical transpose of the (P, G) arrays is needed.
                dquadT = PK._dot(basisT, dq, ((1,), (0,)), PK._PREC_GRAD)
                dquadT = _deloc_grads_T(dquadT, A, B, C, gx - ox, gy - oy)
                dcolorT = PK._dot(g_accT, w, ((1,), (0,)), PK._PREC_GRAD)
                dquad_ref[0, sl, :] = dquadT.T  # (G, 8) — small transpose
                dcolor_ref[0, sl, :] = dcolorT.T  # (G, 4)
            elif nodeloc:
                dquad_chunk = PK._dot(dq, basis, ((0,), (0,)), PK._PREC_GRAD)
                lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 1)
                dquad_chunk = jnp.where(lane == 6, 0.0, dquad_chunk)
                dcolor_chunk = PK._dot(w, g_acc, ((0,), (0,)), PK._PREC_GRAD)
                dquad_ref[0, sl, :] = dquad_chunk
                dcolor_ref[0, sl, :] = dcolor_chunk
            elif fusedgrad:
                # ONE stacked matmul: [dq | w] (P, 2G) against [basis | g_acc]
                # (P, 12) -> (2G, 12); rows [:G, :8] are the dquad moments,
                # rows [G:, 8:12] are dcolor.
                L = jnp.concatenate([dq, w], axis=1)  # (P, 2G)
                R = jnp.concatenate([basis[:, :8], g_acc], axis=1)  # (P, 12)
                out = PK._dot(L, R, ((0,), (0,)), PK._PREC_GRAD)  # (2G, 12)
                dquad_chunk = out[:chunk, :8]
                lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 1)
                dquad_chunk = jnp.where(lane == 6, 0.0, dquad_chunk)
                dquad_chunk = PK._deloc_grads(dquad_chunk, quad_g, ox, oy)
                dcolor_chunk = out[chunk:, 8:12]
                dquad_ref[0, sl, :] = dquad_chunk
                dcolor_ref[0, sl, :] = dcolor_chunk
            else:
                dquad_chunk = PK._dot(dq, basis, ((0,), (0,)), PK._PREC_GRAD)
                lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 1)
                dquad_chunk = jnp.where(lane == 6, 0.0, dquad_chunk)
                dquad_chunk = PK._deloc_grads(dquad_chunk, quad_g, ox, oy)
                dcolor_chunk = PK._dot(w, g_acc, ((0,), (0,)), PK._PREC_GRAD)
                dquad_ref[0, sl, :] = dquad_chunk
                dcolor_ref[0, sl, :] = dcolor_chunk

            pcarry[:] = P_incl[:, -1:]
            wlog_eff = jnp.where(alive, wlog, 0.0)
            if logsp:
                tcarry[:] += jnp.sum(wlog_eff, axis=1, keepdims=True)
            else:
                tcarry[:] *= _exp(
                    jnp.sum(wlog_eff, axis=1, keepdims=True), noexp)
            done[:] = jnp.minimum(dead[:, -1:], 1.0)

    jax.lax.fori_loop(0, n_chunks, body, None, unroll=False)


def _fwd_kernel_pipe(count_ref, quad_ref, color_ref, origin_ref, accum_ref,
                     tfinal_ref, acc, tcarry, done, *, th, tw, K, chunk):
    """Software-pipelined forward: front(ci+1) is computed in the same loop
    body as the carry-dependent tail of chunk ci (no done-skip)."""
    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    P = th * tw
    m_excl, _ = PK._tri_matrices(chunk)
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pxg = (i % tw).astype(F32) + ox
    pyg = (i // tw).astype(F32) + oy

    acc[:] = jnp.zeros((P, 4), F32)
    tcarry[:] = jnp.ones((P, 1), F32)
    done[:] = jnp.zeros((P, 1), F32)
    NC = K // chunk
    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    def front(ci):
        sl = pl.ds(ci * chunk, chunk)
        quad = quad_ref[0, sl, :]
        color = color_ref[0, sl, :]
        alpha, _, _ = PK._chunk_alphas_direct_t(pxg, pyg, quad)
        wlog = jnp.log1p(-alpha)
        cum_excl = PK._dot(wlog, m_excl, ((1,), (0,)), PK._PREC_PREFIX)
        return alpha, wlog, cum_excl, color

    def body(ci, carry):
        alpha, wlog, cum_excl, color = carry
        T_raw = jnp.exp(cum_excl) * tcarry[:]
        trigger = ((T_raw * (1.0 - alpha)) < 1e-4).astype(F32)
        dead = jnp.maximum(trigger, done[:])
        alpha_eff = jnp.where(dead > 0.0, 0.0, alpha)
        w = alpha_eff * T_raw
        acc[:] += PK._dot(w, color, ((1,), (0,)), PK._PREC_GRAD)
        wlog_eff = jnp.where(dead > 0.0, 0.0, wlog)
        tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
        done[:] = jnp.minimum(dead[:, -1:], 1.0)
        return front(jnp.minimum(ci + 1, NC - 1))

    jax.lax.fori_loop(0, n_chunks, body, front(jnp.int32(0)), unroll=False)
    accum_ref[0] = acc[:]
    tfinal_ref[0] = tcarry[:]


def _bwd_kernel_pipe(count_ref, quad_ref, color_ref, gacc_ref, gtf_ref,
                     atot_ref, origin_ref, dquad_ref, dcolor_ref, tcarry,
                     pcarry, done, *, th, tw, K, chunk):
    """Software-pipelined backward with transposed grad emission (noT)."""
    ox = origin_ref[0, 0, 0]
    oy = origin_ref[0, 0, 1]
    P = th * tw
    m_excl, m_incl = PK._tri_matrices(chunk)
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pxg = (i % tw).astype(F32) + ox
    pyg = (i // tw).astype(F32) + oy
    basisT = _pixel_basis_T(th, tw)

    tcarry[:] = jnp.ones((P, 1), F32)
    pcarry[:] = jnp.zeros((P, 1), F32)
    done[:] = jnp.zeros((P, 1), F32)
    dquad_ref[0] = jnp.zeros((K, 8), F32)
    dcolor_ref[0] = jnp.zeros((K, 4), F32)
    g_acc = gacc_ref[0]
    g_accT = g_acc.T
    A_p = atot_ref[0]
    NC = K // chunk
    n_chunks = pl.cdiv(jnp.minimum(count_ref[0, 0, 0], K), chunk)

    def front(ci):
        sl = pl.ds(ci * chunk, chunk)
        quad_g = quad_ref[0, sl, :]
        color = color_ref[0, sl, :]
        alpha, alpha_un, qT = PK._chunk_alphas_direct_t(pxg, pyg, quad_g)
        wlog = jnp.log1p(-alpha)
        cum_excl = PK._dot(wlog, m_excl, ((1,), (0,)), PK._PREC_PREFIX)
        cT = color.T
        cg = (g_acc[:, 0:1] * cT[0:1] + g_acc[:, 1:2] * cT[1:2]
              + g_acc[:, 2:3] * cT[2:3] + g_acc[:, 3:4] * cT[3:4])
        return alpha, alpha_un, wlog, cum_excl, cg, qT

    def body(ci, carry):
        alpha, alpha_un, wlog, cum_excl, cg, qT = carry
        sl = pl.ds(ci * chunk, chunk)
        T_raw = jnp.exp(cum_excl) * tcarry[:]
        trigger = ((T_raw * (1.0 - alpha)) < 1e-4).astype(F32)
        dead = jnp.maximum(trigger, done[:])
        alive = dead == 0.0
        alpha_eff = jnp.where(alive, alpha, 0.0)
        w = alpha_eff * T_raw
        wcg = w * cg
        P_incl = pcarry[:] + PK._dot(wcg, m_incl, ((1,), (0,)),
                                     PK._PREC_PREFIX)
        dalpha = jnp.where(
            alive, T_raw * cg - (A_p - P_incl) / (1.0 - alpha_eff), 0.0)
        dq = dalpha * alpha_un
        dquadT = PK._dot(basisT, dq, ((1,), (0,)), PK._PREC_GRAD)
        dquadT = _deloc_grads_T(dquadT, qT[0:1], qT[1:2], qT[2:3],
                                qT[3:4] - ox, qT[4:5] - oy)
        dcolorT = PK._dot(g_accT, w, ((1,), (0,)), PK._PREC_GRAD)
        dquad_ref[0, sl, :] = dquadT.T
        dcolor_ref[0, sl, :] = dcolorT.T
        pcarry[:] = P_incl[:, -1:]
        wlog_eff = jnp.where(alive, wlog, 0.0)
        tcarry[:] *= jnp.exp(jnp.sum(wlog_eff, axis=1, keepdims=True))
        done[:] = jnp.minimum(dead[:, -1:], 1.0)
        return front(jnp.minimum(ci + 1, NC - 1))

    jax.lax.fori_loop(0, n_chunks, body, front(jnp.int32(0)), unroll=False)


def build_fwd(T, K, P, th, tw, chunk, **kw):
    base = _fwd_kernel_pipe if kw.pop("pipe", False) else _fwd_kernel
    kern = functools.partial(base, th=th, tw=tw, K=K, chunk=chunk, **kw)

    @jax.jit
    def run(counts, tq, tc, origins):
        return pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, K, 4), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0)),
            ],
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
            compiler_params=PK._compiler_params(False),
        )(counts.reshape(T, 1, 1).astype(jnp.int32), tq, tc,
          origins.astype(F32).reshape(T, 1, 2))

    return run


def build_bwd(T, K, P, th, tw, chunk, **kw):
    base = _bwd_kernel_pipe if kw.pop("pipe", False) else _bwd_kernel
    kern = functools.partial(base, th=th, tw=tw, K=K, chunk=chunk, **kw)

    @jax.jit
    def run(counts, tq, tc, gacc, gtf, atot, origins):
        return pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, K, 4), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, P, 4), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, P, 1), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0)),
            ],
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
            compiler_params=PK._compiler_params(False),
        )(counts.reshape(T, 1, 1).astype(jnp.int32), tq, tc, gacc, gtf,
          atot, origins.astype(F32).reshape(T, 1, 2))

    return run


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--tile_h", type=int, default=32)
    ap.add_argument("--tile_w", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=256)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")

    from exavatar_release_tpu.core.camera import Camera
    from exavatar_release_tpu.ops.rasterizer import preprocess as PP
    from exavatar_release_tpu.ops.rasterizer.binning import (
        bin_gaussians_compact, tile_grid)

    H, W = 1088, 1920
    n = args.n
    th, tw, chunk = args.tile_h, args.tile_w, args.chunk
    K = 1024
    ny, nx = tile_grid((H, W), th, tw)
    T = ny * nx
    P = th * tw

    rng = np.random.default_rng(0)
    z = rng.uniform(2.0, 6.0, (n, 1)).astype(np.float32)
    focal = 1000.0
    x = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (W / focal) * z
    y = rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32) * (H / focal) * z
    means = jnp.asarray(np.concatenate([x, y, z], 1))
    scales = jnp.asarray(np.exp(
        rng.uniform(np.log(0.01), np.log(0.05), (n, 3))).astype(np.float32))
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32))
    rgbs = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    live = jnp.ones((n,), bool)
    cam = Camera(R=jnp.eye(3), t=jnp.zeros(3),
                 focal=jnp.asarray([focal, focal]),
                 princpt=jnp.asarray([W / 2.0, H / 2.0]))

    p = jax.jit(lambda: PP.project_gaussians(
        means, scales, quats, opac, rgbs, live, cam, (H, W)))()
    bn = jax.jit(lambda: bin_gaussians_compact(
        p.mean2d, p.radius, p.depth, p.in_frustum, (H, W), th, tw, K,
        extent=p.extent))()
    rows = jnp.concatenate([p.params, p.color], axis=1)
    sentinel = jnp.zeros((1, 12), jnp.float32).at[0, 5].set(-1e9)
    tr = jnp.concatenate([rows[bn.order], sentinel], axis=0)[bn.tile_indices]
    tp, tc = tr[..., :8], tr[..., 8:]
    t_ids = jnp.arange(T, dtype=jnp.int32)
    origins = jnp.stack([(t_ids % nx) * tw, (t_ids // nx) * th],
                        axis=1).astype(jnp.float32)
    counts = bn.tile_counts

    base_f = build_fwd(T, K, P, th, tw, chunk)
    acc, tf = base_f(counts, tp, tc, origins)
    # reference outputs for parity checks
    ref_acc, ref_tf = PK.composite_tiles_fwd(
        tp, tc, counts, (th, tw), chunk, False, tile_origins=origins)
    err = float(jnp.abs(acc - ref_acc).max())
    print(f"fwd/base   : {timeit(base_f, counts, tp, tc, origins, iters=args.iters):7.2f} ms  (parity vs product {err:.2e})")
    for name, kw in [("noexp", dict(noexp=True)), ("nomm", dict(nomm=True)),
                     ("noskip", dict(noskip=True)), ("logsp", dict(logsp=True)),
                     ("pipe", dict(pipe=True))]:
        f = build_fwd(T, K, P, th, tw, chunk, **kw)
        extra = ""
        if name in ("logsp", "pipe"):
            a1, t1 = f(counts, tp, tc, origins)
            extra = (f"  (acc err {float(jnp.abs(a1 - ref_acc).max()):.2e},"
                     f" tf err {float(jnp.abs(t1 - ref_tf).max()):.2e})")
        print(f"fwd/{name:7s}: {timeit(f, counts, tp, tc, origins, iters=args.iters):7.2f} ms{extra}")

    gacc = jnp.ones_like(acc)
    gtf = jnp.ones_like(tf)
    atot = jnp.sum(gacc * ref_acc, axis=-1, keepdims=True) + gtf * ref_tf
    base_b = build_bwd(T, K, P, th, tw, chunk)
    dq0, dc0 = base_b(counts, tp, tc, gacc, gtf, atot, origins)
    rdq, rdc = PK.composite_tiles_bwd(
        tp, tc, counts, gacc, gtf, ref_acc, ref_tf, (th, tw), chunk, False,
        tile_origins=origins)
    err = float(jnp.abs(dq0 - rdq).max())
    print(f"bwd/base   : {timeit(base_b, counts, tp, tc, gacc, gtf, atot, origins, iters=args.iters):7.2f} ms  (parity vs product {err:.2e})")
    for name, kw in [("noexp", dict(noexp=True)), ("nomm", dict(nomm=True)),
                     ("nograd", dict(nograd=True)),
                     ("fusedgrad", dict(fusedgrad=True)),
                     ("noT", dict(noT=True)),
                     ("nodeloc", dict(nodeloc=True)),
                     ("logsp", dict(logsp=True)),
                     ("noT+logsp", dict(noT=True, logsp=True)),
                     ("pipe", dict(pipe=True))]:
        f = build_bwd(T, K, P, th, tw, chunk, **kw)
        dq1, dc1 = f(counts, tp, tc, gacc, gtf, atot, origins)
        extra = ""
        if name in ("fusedgrad", "noT", "logsp", "noT+logsp", "pipe"):
            e1 = float(jnp.abs(dq1 - dq0).max())
            e2 = float(jnp.abs(dc1 - dc0).max())
            extra = f"  (dquad err {e1:.2e}, dcolor err {e2:.2e})"
        print(f"bwd/{name:9s}: {timeit(f, counts, tp, tc, gacc, gtf, atot, origins, iters=args.iters):7.2f} ms{extra}")


if __name__ == "__main__":
    main()
