"""Real spherical-harmonics color evaluation (degrees 0..4).

Semantics match the reference formula table (reference
avatar/common/utils/transforms.py:82-170), which itself follows the
graphdeco-inria 3DGS convention: RGB = clamp(SH(view_dir) + 0.5, 0).

TPU notes: ``eval_sh_upto`` evaluates the basis ONCE as a (N, 25) matrix and
contracts against the coefficient tensor with a single einsum so the work
lands on the MXU; the active degree is a *traced* scalar selected with
``jnp.where`` band masks, keeping one compiled executable across the SH
degree schedule (reference avatar/common/nets/module.py:152-153).
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)

MAX_SH_BANDS = 25  # (4+1)^2


def sh_basis(dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values for unit directions. dirs: (..., 3) -> (..., 25)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    basis = [
        C0 * one,
        -C1 * y,
        C1 * z,
        -C1 * x,
        C2[0] * xy,
        C2[1] * yz,
        C2[2] * (2.0 * zz - xx - yy),
        C2[3] * xz,
        C2[4] * (xx - yy),
        C3[0] * y * (3 * xx - yy),
        C3[1] * xy * z,
        C3[2] * y * (4 * zz - xx - yy),
        C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
        C3[4] * x * (4 * zz - xx - yy),
        C3[5] * z * (xx - yy),
        C3[6] * x * (xx - 3 * yy),
        C4[0] * xy * (xx - yy),
        C4[1] * yz * (3 * xx - yy),
        C4[2] * xy * (7 * zz - 1),
        C4[3] * yz * (7 * zz - 3),
        C4[4] * (zz * (35 * zz - 30) + 3),
        C4[5] * xz * (7 * zz - 3),
        C4[6] * (xx - yy) * (7 * zz - 1),
        C4[7] * xz * (xx - 3 * yy),
        C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
    ]
    return jnp.stack(basis, axis=-1)


def band_mask(active_degree, num_bands: int) -> jnp.ndarray:
    """(num_bands,) float mask: 1 for bands l*l..(l+1)^2-1 with l <= degree.

    ``active_degree`` may be a traced scalar (float or int)."""
    band_idx = jnp.arange(num_bands)
    band_deg = jnp.floor(jnp.sqrt(band_idx.astype(jnp.float32) + 1e-6)).astype(
        jnp.int32
    )
    band_deg = jnp.where(band_idx == 0, 0, band_deg)
    return (band_deg <= jnp.asarray(active_degree).astype(jnp.int32)).astype(
        jnp.float32
    )


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Static-degree SH evaluation.

    sh: (..., C, num_bands) with num_bands >= (deg+1)^2; dirs: (..., 3).
    Returns (..., C). Matches reference eval_sh exactly.
    """
    assert 0 <= deg <= 4
    coeff = (deg + 1) ** 2
    assert sh.shape[-1] >= coeff
    basis = sh_basis(dirs)[..., :coeff]  # (..., coeff)
    return jnp.einsum("...cb,...b->...c", sh[..., :coeff], basis)


def eval_sh_dynamic(active_degree, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Traced-degree SH evaluation: full basis with band masking.

    One compiled executable serves the whole SH-degree schedule.
    sh: (..., C, B); dirs: (..., 3); active_degree: traced scalar.
    """
    num_bands = sh.shape[-1]
    basis = sh_basis(dirs)[..., :num_bands]
    mask = band_mask(active_degree, num_bands)
    return jnp.einsum("...cb,...b->...c", sh, basis * mask)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC band: (rgb - 0.5) / C0 (reference transforms.py:169)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh_dc: jnp.ndarray) -> jnp.ndarray:
    return sh_dc * C0 + 0.5
