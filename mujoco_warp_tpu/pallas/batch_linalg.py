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
import numpy as np
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
    s = a_ref[j]          # A is symmetric: row j == column j, and the
    for k in range(j):    # leading-dim read is contiguous in Mosaic
      s = s - cols[k] * cols[k][j][None, :]
    inv = jax.lax.rsqrt(jnp.maximum(s[j], 1e-15))[None, :]
    col = s * inv
    cols.append(col)
    l_ref[j] = col        # TRANSPOSED storage (row j = column j of L)
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
  # Cholesky, column by column, stored TRANSPOSED (column j of L lives
  # in l_ref row j): every read below is a contiguous leading-dim slice
  # — strided middle-dim l_ref[:, k, :] reads measured ~100x slower in
  # Mosaic (tools/pallas_lint.py PL004). Callers needing standard L
  # transpose once at the XLA level.
  for j in range(nv):
    s = a_ref[j]          # A symmetric: row j == column j, contiguous
    for k in range(j):
      colk = l_ref[k]
      s = s - colk * colk[j][None, :]
    inv = jax.lax.rsqrt(jnp.maximum(s[j], 1e-15))[None, :]
    l_ref[j] = s * inv
  # forward substitution L y = b, column-oriented saxpy (y as values)
  ys = [b_ref[j, :] for j in range(nv)]
  for k in range(nv):
    colk = l_ref[k]
    yk = ys[k] / colk[k]
    ys[k] = yk
    for i in range(k + 1, nv):
      ys[i] = ys[i] - colk[i] * yk
  # backward substitution L^T x = y: row j of L^T is l_ref[j]
  xs = [None] * nv
  for j in range(nv - 1, -1, -1):
    colj = l_ref[j]
    xj = ys[j]
    for k in range(j + 1, nv):
      xj = xj - colj[k] * xs[k]
    xs[j] = xj / colj[j]
  for j in range(nv):
    x_ref[j, :] = xs[j]


@functools.partial(jax.jit, static_argnames=('return_factor',))
def spd_solve_batched(a: jax.Array, b: jax.Array,
                      return_factor: bool = False):
  """Solve A[w] x[w] = b[w] for all worlds w.

  a: (W, nv, nv) SPD, b: (W, nv). Returns x (W, nv) (and L (W, nv, nv)
  lower Cholesky if return_factor). Pads W to a lane multiple.
  """
  w, nv, _ = a.shape
  _vmem_gate(nv, 'spd_solve_batched')
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
    # kernel stores L transposed (contiguous-read layout); hand callers
    # the standard lower factor
    return x, jnp.moveaxis(l[:, :, :w], -1, 0).swapaxes(-1, -2)
  return x


def _solve_from_factor_body(nv: int, l_ref, b_ref, x_ref):
  """Standard lower L input; contiguous row reads only (one l_ref[j]
  per row) with values-staged saxpy substitutions."""
  # forward L y = b: row-oriented
  ys = []
  for j in range(nv):
    rowj = l_ref[j]                       # (nv, L) contiguous
    yj = b_ref[j, :]
    for k in range(j):
      yj = yj - rowj[k] * ys[k]
    ys.append(yj / rowj[j])
  # backward L^T x = y: saxpy with row k of L
  xs = [None] * nv
  for k in range(nv - 1, -1, -1):
    rowk = l_ref[k]
    xk = ys[k] / rowk[k]
    xs[k] = xk
    for i in range(k):
      ys[i] = ys[i] - rowk[i] * xk
  for j in range(nv):
    x_ref[j, :] = xs[j]


@jax.jit
def cho_solve_batched(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b from the precomputed lower factor L (W, nv, nv)."""
  w, nv, _ = l.shape
  _vmem_gate(nv, 'cho_solve_batched')
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


# ---------------------------------------------------------------------------
# tree-sparse LDL (M = L^T D L over the kinematic tree)
# ---------------------------------------------------------------------------
#
# The joint-space mass matrix has tree sparsity: M[i, j] != 0 only when
# j is an ancestor of i in the dof tree. LDL^T in reverse topological
# order factors with ZERO fill-in (reference exploits this with a
# level-scheduled CSR factorization, mujoco_warp/_src/smooth.py:1017;
# C MuJoCo mj_factorM). The worlds-in-lanes form here unrolls the
# static (k, ancestor) schedule — O(sum_k depth(k)) row FMAs instead of
# O(nv^3/6) — which is what makes nv ~ 80+ scenes (three_humanoids)
# viable in Mosaic: ~500 vector statements instead of ~88k.
#
# Trick that removes all masking: updates use FULL (nv, L) row FMAs.
# For j <= rowidx the update lands exactly where the sparse algorithm
# writes; for j > rowidx it writes garbage into the STRICT UPPER
# triangle, which no consumer ever reads (factor rows store L at
# ancestor columns + D on the diagonal; the solves read only those).


def _vmem_gate(nv: int, name: str, budget_mb: float = 100.0) -> None:
  """Refuse kernels whose per-block VMEM windows cannot fit. The tree
  kernels window TWO dense (nv, nv, 128) f32 blocks (input + factor,
  double-buffered across grid steps); past ~100 MB Mosaic either
  rejects the kernel or the compile helper dies (round-3 cloth:
  nv=2706 → 3.7 GB demanded of a 128 MB VMEM). Models this large must
  use the sparse-qM path (mujoco_warp_tpu/sparse.py), which put_model
  selects automatically above MJWT_SPARSE_NV."""
  window_mb = 2 * 2 * nv * nv * LANES * 4 / 1e6
  if window_mb > budget_mb:
    raise ValueError(
        f'{name}: nv={nv} needs ~{window_mb:.0f} MB of VMEM windows '
        f'(budget ~{budget_mb:.0f} MB). Use the sparse-qM path '
        '(put_model enables it above MJWT_SPARSE_NV for CG models) '
        'instead of the dense tree-LDL kernel.')


def dof_ancestors(dof_parentid) -> tuple:
  """Static ancestor chains (descending index order) per dof."""
  anc = []
  for k in range(len(dof_parentid)):
    chain = []
    i = int(dof_parentid[k])
    while i >= 0:
      chain.append(i)
      i = int(dof_parentid[i])
    anc.append(tuple(chain))
  return tuple(anc)


def ldl_factor_rows(anc, md_ref):
  """In-place tree LDL on md_ref (nv, nv, L): row k ends with L[k, i]
  at ancestor columns i, D[k] on the diagonal, garbage strictly above.
  Callable from other Mosaic kernel bodies (fused Newton solver)."""
  nv = len(anc)
  col = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
  for k in range(nv - 1, -1, -1):
    if not anc[k]:
      continue
    rowk = md_ref[k]                       # (nv, L), final for this k
    inv_dk = 1.0 / jnp.maximum(rowk[k], 1e-15)
    lrow = rowk
    for i in anc[k]:
      c = rowk[i] * inv_dk                 # (L,)
      md_ref[i] = md_ref[i] - c[None, :] * rowk
      lrow = jnp.where(col == i, c[None, :], lrow)
    md_ref[k] = lrow


def ldl_solve_rows(anc, ld_ref, b_rows):
  """Solve (L^T D L) x = b from the packed factor. b_rows: list of nv
  (L,) values; returns list of nv (L,) values (value-carried — no ref
  read-after-write serialization)."""
  nv = len(anc)
  xs = list(b_rows)
  rows = [ld_ref[k] for k in range(nv)]
  for k in range(nv - 1, -1, -1):          # L^T z = b
    for i in anc[k]:
      xs[i] = xs[i] - rows[k][i] * xs[k]
  for k in range(nv):                      # y = z / D
    xs[k] = xs[k] / jnp.maximum(rows[k][k], 1e-15)
  for k in range(nv):                      # L x = y
    for i in anc[k]:
      xs[k] = xs[k] - rows[k][i] * xs[i]
  return xs


def _tree_ldl_kernel(anc, a_ref, b_ref, diag_ref, x_ref, ld_ref):
  nv = len(anc)
  ri = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
  ci = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1)
  dmask = (ri == ci).astype(a_ref.dtype)   # (nv, nv, 1) diagonal mask
  ld_ref[...] = a_ref[...] + dmask * diag_ref[...][:, :, None]
  ldl_factor_rows(anc, ld_ref)
  nv = len(anc)
  xs = ldl_solve_rows(anc, ld_ref, [b_ref[k] for k in range(nv)])
  x_ref[...] = jnp.stack(xs, axis=0)


def _tree_solve_kernel(anc, ld_ref, b_ref, x_ref):
  nv = len(anc)
  xs = ldl_solve_rows(anc, ld_ref, [b_ref[k] for k in range(nv)])
  x_ref[...] = jnp.stack(xs, axis=0)


@functools.partial(jax.jit, static_argnames=('parentid', 'return_factor',
                                             'interpret'))
def tree_ldl_solve_batched(a: jax.Array, b: jax.Array, parentid: tuple,
                           diag: jax.Array | None = None,
                           return_factor: bool = False,
                           interpret: bool = False):
  """Solve (A[w] + diag(extra)) x[w] = b[w] via tree-sparse LDL.

  a: (W, nv, nv) with kinematic-tree sparsity given by dof parentid,
  b: (W, nv), diag: optional (nv,) added to the diagonal (Euler damping
  — tree sparsity is preserved). Returns x (W, nv) (and the packed
  (W, nv, nv) LD factor if return_factor)."""
  w, nv, _ = a.shape
  _vmem_gate(nv, 'tree_ldl_solve_batched')
  anc = dof_ancestors(parentid)
  wpad = -(-w // LANES) * LANES
  at = jnp.moveaxis(a, 0, -1)
  bt = jnp.moveaxis(b, 0, -1)
  if wpad != w:
    eye3 = jnp.eye(nv, dtype=a.dtype)[:, :, None]
    pad_mask = jnp.arange(wpad) >= w
    at = jnp.where(pad_mask[None, None, :], eye3,
                   jnp.pad(at, ((0, 0), (0, 0), (0, wpad - w))))
    bt = jnp.pad(bt, ((0, 0), (0, wpad - w)))
  dvec = (jnp.zeros((nv, 1), a.dtype) if diag is None
          else diag.astype(a.dtype).reshape(nv, 1))
  kernel = functools.partial(_tree_ldl_kernel, anc)
  x, ld = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      interpret=interpret,
      in_specs=[
          pl.BlockSpec((nv, nv, LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, 1), lambda i: (0, 0),
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
  )(at, bt, dvec)
  x = jnp.moveaxis(x[:, :w], -1, 0)
  if return_factor:
    return x, jnp.moveaxis(ld[:, :, :w], -1, 0)
  return x


@functools.partial(jax.jit, static_argnames=('parentid', 'interpret'))
def tree_solve_from_factor_batched(ld: jax.Array, b: jax.Array,
                                   parentid: tuple,
                                   interpret: bool = False) -> jax.Array:
  """Solve from a packed tree-LDL factor (W, nv, nv) as returned by
  tree_ldl_solve_batched(return_factor=True)."""
  w, nv, _ = ld.shape
  _vmem_gate(nv, 'tree_solve_from_factor_batched')
  anc = dof_ancestors(parentid)
  wpad = -(-w // LANES) * LANES
  lt = jnp.moveaxis(ld, 0, -1)
  bt = jnp.moveaxis(b, 0, -1)
  if wpad != w:
    eye3 = jnp.eye(nv, dtype=ld.dtype)[:, :, None]
    pad_mask = jnp.arange(wpad) >= w
    lt = jnp.where(pad_mask[None, None, :], eye3,
                   jnp.pad(lt, ((0, 0), (0, 0), (0, wpad - w))))
    bt = jnp.pad(bt, ((0, 0), (0, wpad - w)))
  kernel = functools.partial(_tree_solve_kernel, anc)
  x = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      interpret=interpret,
      in_specs=[
          pl.BlockSpec((nv, nv, LANES), lambda i: (0, 0, i),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nv, LANES), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((nv, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((nv, wpad), ld.dtype),
  )(lt, bt)
  return jnp.moveaxis(x[:, :w], -1, 0)
