"""Batched small-dense Cholesky factor/solve as one Pallas kernel.

The engine's dense regime is thousands of tiny (nv x nv, nv <= ~60) SPD
solves — one per world. XLA's approaches are both poor here: the
custom-call cholesky is pathologically slow for small batched matrices,
and an unrolled scalar factorization emits O(nv^2) un-fused HBM-bound
vector ops (measured ~7 ms per factor at nv=27, W=2048 — SURVEY's
"tiled Cholesky" Pallas item).

Layout: worlds live in the 128-wide lane dimension — arrays are
(nv, nv, W) / (nv, W) blocks of (nv, nv, 128) / (nv, 128) in VMEM, so
every scalar step of the factorization is one (sublane, lane) VPU op
over 128 worlds and the entire factor+solve is a single kernel with
zero intermediate HBM traffic (the role wp.tile_cholesky plays in the
reference, mujoco_warp/_src/smooth.py:1068).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


_VALUES_MAX = 32  # above this, keeping columns as live values blows
                  # Mosaic's scoped-vmem stack; accumulate via refs


def _cholesky_solve_body_values(nv: int, a_ref, b_ref, x_ref, l_ref):
  """Small-nv variant: columns kept as live values (faster — no
  read-after-write serialization against the output ref)."""
  cols = []
  for j in range(nv):
    s = a_ref[:, j, :]
    for k in range(j):
      s = s - cols[k] * cols[k][j][None, :]
    inv = jax.lax.rsqrt(jnp.maximum(s[j], 1e-15))[None, :]
    col = s * inv
    cols.append(col)
    l_ref[:, j, :] = col
  ys = []
  for j in range(nv):
    yj = b_ref[j, :]
    for k in range(j):
      yj = yj - cols[k][j] * ys[k]
    ys.append(yj / cols[j][j])
  xs = [None] * nv
  for j in range(nv - 1, -1, -1):
    xj = ys[j]
    for k in range(j + 1, nv):
      xj = xj - cols[j][k] * xs[k]
    xs[j] = xj / cols[j][j]
  x_ref[:, :] = jnp.stack(xs, axis=0)


def _cholesky_solve_body(nv: int, a_ref, b_ref, x_ref, l_ref):
  """Factor A (nv, nv, L) and solve A x = b for one world-lane block.

  Columns accumulate THROUGH the output ref (read back per step) so
  VMEM live-set stays O(1) columns — keeping all columns as values made
  Mosaic's stack exceed scoped vmem beyond nv~40."""
  if nv <= _VALUES_MAX:
    return _cholesky_solve_body_values(nv, a_ref, b_ref, x_ref, l_ref)
  # Cholesky, column by column
  for j in range(nv):
    s = a_ref[:, j, :]
    for k in range(j):
      s = s - l_ref[:, k, :] * l_ref[j, k, :][None, :]
    inv = jax.lax.rsqrt(jnp.maximum(s[j], 1e-15))[None, :]
    l_ref[:, j, :] = s * inv
  # forward substitution L y = b (y staged in x_ref)
  for j in range(nv):
    yj = b_ref[j, :]
    for k in range(j):
      yj = yj - l_ref[j, k, :] * x_ref[k, :]
    x_ref[j, :] = yj / l_ref[j, j, :]
  # backward substitution L^T x = y, in place
  for j in range(nv - 1, -1, -1):
    xj = x_ref[j, :]
    for k in range(j + 1, nv):
      xj = xj - l_ref[k, j, :] * x_ref[k, :]
    x_ref[j, :] = xj / l_ref[j, j, :]


@functools.partial(jax.jit, static_argnames=('return_factor',))
def spd_solve_batched(a: jax.Array, b: jax.Array,
                      return_factor: bool = False):
  """Solve A[w] x[w] = b[w] for all worlds w.

  a: (W, nv, nv) SPD, b: (W, nv). Returns x (W, nv) (and L (W, nv, nv)
  lower Cholesky if return_factor). Pads W to a lane multiple.
  """
  w, nv, _ = a.shape
  wpad = -(-w // LANES) * LANES
  # batch-last layout for lanes
  at = jnp.moveaxis(a, 0, -1)              # (nv, nv, W)
  bt = jnp.moveaxis(b, 0, -1)              # (nv, W)
  if wpad != w:
    at = jnp.pad(at, ((0, 0), (0, 0), (0, wpad - w)))
    # pad matrices with identity to keep the factorization finite
    eye = jnp.eye(nv, dtype=a.dtype)[:, :, None]
    pad_mask = jnp.arange(wpad) >= w
    at = jnp.where(pad_mask[None, None, :], eye, at)
    bt = jnp.pad(bt, ((0, 0), (0, wpad - w)))

  kernel = functools.partial(_cholesky_solve_body, nv)
  x, l = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      in_specs=[
          pl.BlockSpec((nv, nv, LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((nv, LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, nv, LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((nv, wpad), a.dtype),
          jax.ShapeDtypeStruct((nv, nv, wpad), a.dtype),
      ],
  )(at, bt)
  x = jnp.moveaxis(x[:, :w], -1, 0)
  if return_factor:
    return x, jnp.moveaxis(l[:, :, :w], -1, 0)
  return x


def _solve_from_factor_body(nv: int, l_ref, b_ref, x_ref):
  for j in range(nv):
    yj = b_ref[j, :]
    for k in range(j):
      yj = yj - l_ref[j, k, :] * x_ref[k, :]
    x_ref[j, :] = yj / l_ref[j, j, :]
  for j in range(nv - 1, -1, -1):
    xj = x_ref[j, :]
    for k in range(j + 1, nv):
      xj = xj - l_ref[k, j, :] * x_ref[k, :]
    x_ref[j, :] = xj / l_ref[j, j, :]


@jax.jit
def cho_solve_batched(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b from the precomputed lower factor L (W, nv, nv)."""
  w, nv, _ = l.shape
  wpad = -(-w // LANES) * LANES
  lt = jnp.moveaxis(l, 0, -1)
  bt = jnp.moveaxis(b, 0, -1)
  if wpad != w:
    eye = jnp.eye(nv, dtype=l.dtype)[:, :, None]
    pad_mask = jnp.arange(wpad) >= w
    lt = jnp.where(pad_mask[None, None, :], eye,
                   jnp.pad(lt, ((0, 0), (0, 0), (0, wpad - w))))
    bt = jnp.pad(bt, ((0, 0), (0, wpad - w)))
  kernel = functools.partial(_solve_from_factor_body, nv)
  x = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      in_specs=[
          pl.BlockSpec((nv, nv, LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((nv, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((nv, wpad), l.dtype),
  )(lt, bt)
  return jnp.moveaxis(x[:, :w], -1, 0)
