"""Full-precision contraction helpers.

On TPU, fp32 `jnp.einsum`/`@` default to bf16 MXU passes
(precision=DEFAULT).  Geometry math — projections, homographies, ray
transforms — needs true fp32: a bf16 pixel coordinate at x~300 carries
~1px error.  All geometry code therefore contracts through these
helpers; neural-net layers keep the fast default (they are bf16 by
design).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

feinsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def fmatmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
