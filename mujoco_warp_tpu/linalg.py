"""Small-matrix linear algebra, unrolled for XLA fusion.

XLA's ``cholesky``/``triangular_solve`` lower to custom-calls that are
pathologically slow on TPU for small batched matrices (nv <= ~60, batch =
nworld): profiling the humanoid step showed them dominating the step.
These unrolled versions emit only elementwise/slice ops, so under vmap
they fuse into the surrounding pipeline — the role the reference's
``wp.tile_cholesky`` plays on GPU (mujoco_warp/_src/smooth.py:1068,
block_cholesky.py).

All functions operate on a single world (vmap supplies the batch) and
unroll over the static matrix dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_UNROLL_MAX = 32  # above this, unrolling blows up compile time; use
                  # the library factorization (XLA custom call)


def cholesky(a: jax.Array) -> jax.Array:
  """Lower Cholesky factor of SPD (n, n), unrolled column-by-column."""
  n = a.shape[-1]
  if n == 0:           # static-only models (nv = 0)
    return a
  if n > _UNROLL_MAX:
    return jnp.linalg.cholesky(a)
  cols = []
  for j in range(n):
    s = a[:, j]
    for k in range(j):
      s = s - cols[k] * cols[k][j]
    inv = jax.lax.rsqrt(jnp.maximum(s[j], 1e-15))
    col = s * inv
    # zero the strictly-upper part of this column
    mask = jnp.arange(n) >= j
    cols.append(jnp.where(mask, col, 0.0))
  return jnp.stack(cols, axis=1)


def solve_lower(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve L x = b with lower-triangular L, forward substitution."""
  n = l.shape[-1]
  x = b
  for j in range(n):
    xj = x[j] / l[j, j]
    mask = jnp.arange(n) > j
    x = jnp.where(mask, x - l[:, j] * xj, x)
    x = x.at[j].set(xj)
  return x


def solve_upper_t(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve L^T x = b with lower-triangular L, backward substitution."""
  n = l.shape[-1]
  x = b
  for j in range(n - 1, -1, -1):
    xj = x[j] / l[j, j]
    mask = jnp.arange(n) < j
    x = jnp.where(mask, x - l[j, :] * xj, x)
    x = x.at[j].set(xj)
  return x


def cho_solve(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b given A's lower Cholesky factor."""
  if l.shape[-1] > _UNROLL_MAX:
    return jax.scipy.linalg.cho_solve((l, True), b[..., None])[..., 0]
  return solve_upper_t(l, solve_lower(l, b))


def spd_solve(a: jax.Array, b: jax.Array) -> jax.Array:
  """Solve SPD A x = b (factor + two substitutions, all fused)."""
  return cho_solve(cholesky(a), b)
