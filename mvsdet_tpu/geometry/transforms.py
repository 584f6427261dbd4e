"""Rotation / covariance helpers for Gaussian primitives.

Pure-jnp equivalents of gs_src/model/encoder/common/gaussians.py:
  - quaternion (xyzw) -> rotation matrix   (ref :8-30)
  - covariance = R S S^T R^T               (ref :33-44)
"""

from __future__ import annotations

import jax.numpy as jnp

from mvsdet_tpu.utils.precision import feinsum


def quaternion_to_matrix(q_xyzw: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation matrix from an (x, y, z, w) quaternion (scipy order).

    Matches gs_src/model/encoder/common/gaussians.py:8-30 including the
    2/(|q|^2 + eps) normalisation (inputs need not be unit quaternions).

    Args:
      q_xyzw: (..., 4).

    Returns:
      (..., 3, 3).
    """
    i, j, k, r = jnp.moveaxis(q_xyzw, -1, 0)
    two_s = 2.0 / (jnp.sum(q_xyzw * q_xyzw, axis=-1) + eps)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(o.shape[:-1] + (3, 3))


def build_covariance(scale: jnp.ndarray, rotation_xyzw: jnp.ndarray) -> jnp.ndarray:
    """3x3 Gaussian covariance from per-axis scales and a quaternion.

    Matches gs_src/model/encoder/common/gaussians.py:33-44:
    ``R diag(s) diag(s)^T R^T`` = R diag(s^2) R^T.

    Args:
      scale: (..., 3) per-axis standard deviations.
      rotation_xyzw: (..., 4) quaternion.

    Returns:
      (..., 3, 3) covariance matrices.
    """
    rot = quaternion_to_matrix(rotation_xyzw)
    s2 = scale**2
    return feinsum("...ik,...k,...jk->...ij", rot, s2, rot)
