"""Real spherical harmonics: evaluation and rotation.

TPU-native replacement for the reference's SH handling:
  - evaluation uses the 3DGS basis/constants (the same polynomial basis the
    reference's CUDA rasterizer evaluates in `computeColorFromSH`,
    diff-gaussian-rasterization; referenced from
    gs_src/model/decoder/cuda_splatting.py:116-127).
  - rotation replaces e3nn `wigner_D` (ref: gs_src/misc/sh_rotation.py:10-30)
    with a sampling-based projection: for a rotation R, the per-degree
    rotation matrix is ``D = pinv(B(S)) @ B(R^T S)`` for a fixed,
    well-conditioned direction sample set S, where B evaluates the basis.
    This is exact (SH degrees are rotation-invariant subspaces), cheap
    (rotations here are a handful of camera poses), differentiable, and —
    crucially — self-consistent with *our* evaluation basis, so
    ``eval(rotate_sh(c, R), d) == eval(c, R^T d)`` holds by construction.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mvsdet_tpu.utils.precision import feinsum

# 3DGS real-SH constants (standard graphics convention).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)

MAX_DEGREE = 4


def eval_sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    Args:
      dirs: (..., 3) unit direction vectors.
      degree: max SH degree (0..4 supported).

    Returns:
      (..., (degree+1)**2) basis values, ordered degree-major, m=-l..l.
    """
    if not 0 <= degree <= MAX_DEGREE:
        raise ValueError(f"degree {degree} unsupported (max {MAX_DEGREE})")
    # numpy in -> numpy out: lets _pinv_blocks precompute on the host
    # without touching (or tracing through) the XLA backend
    xp = np if isinstance(dirs, np.ndarray) else jnp
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = xp.ones_like(x)
    out = [_C0 * one]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3.0 * xx - yy),
            _C4[2] * xy * (7.0 * zz - 1.0),
            _C4[3] * yz * (7.0 * zz - 3.0),
            _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            _C4[5] * xz * (7.0 * zz - 3.0),
            _C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            _C4[7] * xz * (xx - 3.0 * yy),
            _C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return xp.stack(out, axis=-1)


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
        axis=-1,
    )


# Fixed sample set (static across all calls) and per-degree pseudo-inverse
# of the basis matrix, precomputed in float64 for conditioning.
_N_SAMPLES = 64
_SAMPLES = _fibonacci_sphere(_N_SAMPLES)


def _basis_np(dirs: np.ndarray, degree: int) -> np.ndarray:
    return np.asarray(eval_sh_basis(np.asarray(dirs, np.float64), degree),
                      np.float64)


def _pinv_blocks(degree: int):
    """pinv of per-degree basis blocks at the fixed sample directions."""
    b = _basis_np(_SAMPLES, degree)  # (S, (deg+1)^2)
    pinvs = []
    for l in range(degree + 1):
        blk = b[:, l * l:(l + 1) * (l + 1)]
        pinvs.append(np.linalg.pinv(blk))  # ((2l+1), S)
    return pinvs


# lazy: a module-level jnp computation would initialise the XLA backend
# at import time, which breaks jax.distributed.initialize in multi-host
# workers (it must run before any backend-initialising call)
_PINV_CACHE: dict = {}


def _get_pinv_blocks(degree: int):
    if degree not in _PINV_CACHE:
        _PINV_CACHE[degree] = _pinv_blocks(degree)
    return _PINV_CACHE[degree]


def sh_rotation_matrix(rot: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Block-diagonal rotation matrix for real SH coefficients.

    Satisfies ``eval(D @ c, d) == eval(c, R^T d)`` — i.e. D rotates the
    represented function by R (same semantics as the reference's
    `rotate_sh`, gs_src/misc/sh_rotation.py:10-30, which rotates
    camera-frame SH into world frame with R = c2w rotation).

    Args:
      rot: (..., 3, 3) rotation matrices.
      degree: max degree.

    Returns:
      (..., n, n) with n = (degree+1)**2.
    """
    n = (degree + 1) ** 2
    samples = jnp.asarray(_SAMPLES, rot.dtype)  # (S, 3)
    # directions R^T s  -> (..., S, 3)
    rotated = feinsum("...ji,sj->...si", rot, samples)
    basis_rot = eval_sh_basis(rotated, degree)  # (..., S, n)
    blocks = []
    for l in range(degree + 1):
        pinv = jnp.asarray(_get_pinv_blocks(degree)[l], rot.dtype)  # (2l+1, S)
        blk = feinsum("ms,...sk->...mk", pinv,
                         basis_rot[..., l * l:(l + 1) * (l + 1)])
        blocks.append(blk)
    out = jnp.zeros(rot.shape[:-2] + (n, n), rot.dtype)
    for l, blk in enumerate(blocks):
        out = out.at[..., l * l:(l + 1) * (l + 1),
                     l * l:(l + 1) * (l + 1)].set(blk)
    return out


def rotate_sh(sh: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Rotate real SH coefficient vectors by rotation matrices.

    Args:
      sh: (..., n) coefficients, n = (degree+1)**2.
      rot: (..., 3, 3) broadcast-compatible rotations.

    Returns:
      (..., n) rotated coefficients.
    """
    n = sh.shape[-1]
    degree = int(round(n**0.5)) - 1
    if (degree + 1) ** 2 != n:
        raise ValueError(f"sh dim {n} is not a square")
    d = sh_rotation_matrix(rot, degree)
    return feinsum("...ij,...j->...i", d, sh)


def eval_sh_color(sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """RGB from SH coefficients and view directions, 3DGS convention.

    Matches the CUDA rasterizer's ``computeColorFromSH``: sum of basis *
    coefficients, plus 0.5, clamped at 0.

    Args:
      sh: (..., 3, n) per-channel coefficients.
      dirs: (..., 3) unit view directions (gaussian center - camera).

    Returns:
      (..., 3) non-negative colors.
    """
    n = sh.shape[-1]
    degree = int(round(n**0.5)) - 1
    basis = eval_sh_basis(dirs, degree)  # (..., n)
    color = feinsum("...cn,...n->...c", sh, basis) + 0.5
    return jnp.maximum(color, 0.0)
