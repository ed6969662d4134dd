"""Reference (non-Pallas) tile compositor in pure JAX.

Semantics-defining oracle for the Pallas kernels and a CPU-friendly fallback
backend. Implements exactly the front-to-back alpha compositing rules of the
reference's CUDA ``renderCUDA`` (external diff-gaussian-rasterization-depth,
consumed at reference avatar/common/nets/module.py:632-640):

  power = -0.5·(A·dx² + C·dy²) - B·dx·dy            (skip if power > 0)
  alpha = min(0.99, opacity·exp(power))             (skip if alpha < 1/255)
  test_T = T·(1 - alpha); if test_T < 1e-4: DONE    (skip BEFORE contributing)
  C += rgb·alpha·T;  T = test_T

Early termination is sticky and excludes the triggering Gaussian itself,
exactly as renderCUDA's ``done`` flag does; modeled with a carried done bit.

This path is fully differentiable through JAX autodiff — used to verify the
hand-derived Pallas VJP.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def composite_tiles_ref(
    tile_quad: jnp.ndarray,  # (T, K, 8) tile-LOCAL coeffs, or GLOBAL rows
    tile_color: jnp.ndarray,  # (T, K, 4)
    tile_shape: Tuple[int, int],  # (tile_h, tile_w) static
    tile_origins: jnp.ndarray = None,  # (T, 2): rows are GLOBAL conic params
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential-scan compositing. Returns (accum (T,P,4), tfinal (T,P,1)).

    With ``tile_origins``, rows are global [A, B, C, gx, gy, log_op, _, _]
    and q is the direct conic form exactly as renderCUDA (and the v1 Pallas
    kernel's ``_chunk_alphas_direct``) evaluates it — same fp expression
    order, so oracle-vs-kernel parity is tight rather than
    path-of-evaluation-limited."""
    th, tw = tile_shape
    P = th * tw
    direct = tile_origins is not None

    def one_tile(quad, color, origin=None):
        i = jnp.arange(P, dtype=jnp.int32)
        px = (i % tw).astype(jnp.float32)
        py = (i // tw).astype(jnp.float32)
        if direct:
            pxg = px + origin[0]
            pyg = py + origin[1]
        basis = jnp.stack(
            [jnp.ones_like(px), px, py, px * px, px * py, py * py], axis=1
        )  # (P, 6)

        def step(carry, gk):
            accum, T, done = carry
            coeff, col = gk
            if direct:
                dx = pxg - coeff[3]
                dy = pyg - coeff[4]
                log_op = coeff[5]
                q = log_op - 0.5 * (
                    coeff[0] * (dx * dx) + coeff[2] * (dy * dy)
                ) - coeff[1] * (dx * dy)
            else:
                # HIGHEST: default dot precision rounds f32 inputs to bf16,
                # which destroys the cancelling quadratic (see pallas_kernels)
                q = jnp.dot(basis, coeff[:6],
                            precision=jax.lax.Precision.HIGHEST)  # (P,)
                log_op = coeff[6]
            alpha_un = jnp.exp(q)
            valid = (q <= log_op) & (alpha_un >= 1.0 / 255.0)
            alpha = jnp.where(valid, jnp.minimum(alpha_un, 0.99), 0.0)
            # sticky early termination, excluding the triggering Gaussian
            test_T = T[:, 0] * (1.0 - alpha)
            done = done | (test_T < 1e-4)
            alpha = jnp.where(done, 0.0, alpha)
            w = alpha * T[:, 0]
            accum = accum + w[:, None] * col[None, :]
            T = T * (1.0 - alpha)[:, None]
            return (accum, T, done), None

        init = (
            jnp.zeros((P, 4), jnp.float32),
            jnp.ones((P, 1), jnp.float32),
            jnp.zeros((P,), bool),
        )
        (accum, T, _), _ = jax.lax.scan(step, init, (quad, color))
        return accum, T

    if direct:
        return jax.lax.map(
            lambda args: one_tile(*args),
            (tile_quad, tile_color, tile_origins.astype(jnp.float32)),
        )
    return jax.lax.map(lambda args: one_tile(*args), (tile_quad, tile_color))
