"""Worlds-in-lanes Pallas Newton solver: the ENTIRE constraint solve —
init, linesearch, constraint update, Hessian assembly, Cholesky,
convergence — in ONE kernel per 128-world block.

Why: the XLA-level solver pays ~15-20 fused-kernel dispatches per
iteration plus a full HBM round trip of efc_J (~77 MB at 8192 worlds),
and its `lax.while_loop` iterates until the SLOWEST world of the whole
batch converges. Here each 128-world block iterates only until its own
worlds are done (the TPU analogue of the reference's per-world early
outs + conditional CUDA graph, mujoco_warp/_src/solver.py:3151-3343),
and every per-iteration quantity lives in VMEM.

Scope: Newton + pyramidal cone + parallel linesearch (the benchmark
regime). CG / elliptic / iterative-LS fall back to the XLA solver.

As a bonus the kernel also computes qacc_smooth = qM^-1 qfrc_smooth and
the qM Cholesky factor (the fwd_acceleration products, reference
smooth.py:2907 factor_solve_i) since qM must be resident anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_MINVAL = 1e-15


def _chol_cols(nv, row_read):
  """Cholesky of a symmetric A given contiguous row reads (row j ==
  column j). Columns are kept as live values (no strided ref traffic),
  the pattern proven in batch_linalg._cholesky_solve_body_values."""
  cols = []
  for j in range(nv):
    s = row_read(j)                       # (nv, L)
    for k in range(j):
      s = s - cols[k] * cols[k][j][None, :]
    inv = jax.lax.rsqrt(jnp.maximum(s[j], _MINVAL))[None, :]
    cols.append(s * inv)
  return cols


def _chol_solve(nv, cols, b):
  """Solve L L^T x = b from value columns; b (nv, L) -> x (nv, L)."""
  ys = []
  for j in range(nv):
    yj = b[j]
    for k in range(j):
      yj = yj - cols[k][j] * ys[k]
    ys.append(yj / cols[j][j])
  xs = [None] * nv
  for j in range(nv - 1, -1, -1):
    xj = ys[j]
    for k in range(j + 1, nv):
      xj = xj - cols[j][k] * xs[k]
    xs[j] = xj / cols[j][j]
  return jnp.stack(xs, axis=0)


def _newton_kernel(cfg, p_ref, qm_ref, j_ref, d_ref, aref_ref, fl_ref,
                   qfs_ref, ws_ref, hb_ref, qacc_ref, qfc_ref, force_ref,
                   niter_ref, qaccs_ref, qld_ref, qacce_ref, h_scr,
                   jd_scr, ma_scr, jaref_scr, search_scr, cost_scr,
                   done_scr):
  """J layout is (nv, nj, L): every hot read — J rows, qM rows, H rows —
  is a contiguous leading-dim slice. Strided middle-dim indexing and
  per-element writes measured ~100x slower in Mosaic."""
  (nv, nj, ne, nf, iterations, ls_k, use_ws, euler_damp) = cfg
  L = qfs_ref.shape[-1]
  dt = jnp.float32

  tol = p_ref[0, 0]
  meaninertia = p_ref[1, 0]
  rescale_den = jnp.maximum(meaninertia, _MINVAL) * max(1, nv)

  # static row-class masks from the fixed efc layout (rows [0,ne) are
  # equality, [ne,ne+nf) friction, the rest one-sided limits/contacts);
  # built with iota in-kernel (captured jnp constants are not allowed)
  r = jax.lax.broadcasted_iota(jnp.int32, (nj, 1), 0)
  is_eq = r < ne
  is_fr = (r >= ne) & (r < ne + nf)
  is_one = r >= ne + nf

  D = d_ref[...]
  fl = fl_ref[...]
  rf = fl / jnp.maximum(D, _MINVAL)
  qfs = qfs_ref[...]

  def matvec_qm(x):
    rows = [jnp.sum(qm_ref[i] * x, axis=0, keepdims=True)
            for i in range(nv)]
    return jnp.concatenate(rows, axis=0)

  def matvec_j(x):                         # (nv, L) -> (nj, L)
    acc = j_ref[0] * x[0:1]
    for n in range(1, nv):
      acc = acc + j_ref[n] * x[n:n + 1]
    return acc

  def matvec_jt(y):                        # (nj, L) -> (nv, L)
    rows = [jnp.sum(j_ref[n] * y, axis=0, keepdims=True)
            for n in range(nv)]
    return jnp.concatenate(rows, axis=0)

  # ---- qM factor + qacc_smooth (fwd_acceleration fold-in) ----
  qm_cols = _chol_cols(nv, lambda j: qm_ref[j])
  for j in range(nv):
    qld_ref[:, j, :] = qm_cols[j]
  qacc_smooth = _chol_solve(nv, qm_cols, qfs)
  qaccs_ref[...] = qacc_smooth

  def update_constraint(jaref):
    lin_neg = is_fr & (jaref <= -rf)
    lin_pos = is_fr & (jaref >= rf)
    quad = is_eq | (is_fr & ~lin_neg & ~lin_pos) | (is_one & (jaref < 0.0))
    force = jnp.where(quad, -D * jaref, 0.0)
    force = jnp.where(lin_neg, fl, force)
    force = jnp.where(lin_pos, -fl, force)
    cost_rows = jnp.where(quad, 0.5 * D * jaref * jaref, 0.0)
    cost_rows = jnp.where(lin_neg, -fl * (0.5 * rf + jaref), cost_rows)
    cost_rows = jnp.where(lin_pos, -fl * (0.5 * rf - jaref), cost_rows)
    cost = jnp.sum(cost_rows, axis=0, keepdims=True)
    return force, cost, quad

  def gauss_cost(qacc, ma):
    return 0.5 * jnp.sum((ma - qfs) * (qacc - qacc_smooth), axis=0,
                         keepdims=True)

  def newton_mgrad(grad, quad):
    dh = D * quad.astype(dt)               # (nj, L)
    for i in range(nv):
      jd_scr[i] = j_ref[i] * dh
    for i in range(nv):
      vals = [jnp.sum(jd_scr[i] * j_ref[j], axis=0, keepdims=True)
              for j in range(nv)]
      h_scr[i] = qm_ref[i] + jnp.concatenate(vals, axis=0)
    cols = _chol_cols(nv, lambda j: h_scr[j])
    return _chol_solve(nv, cols, grad)

  def linesearch(jaref, search, ma, jv, mv):
    g0 = jnp.sum(search * (ma - qfs), axis=0, keepdims=True)
    h0 = jnp.sum(search * mv, axis=0, keepdims=True)

    def phi_d(alpha):                      # alpha (1, L)
      x = jaref + alpha * jv
      lin_neg = is_fr & (x <= -rf)
      lin_pos = is_fr & (x >= rf)
      quad = is_eq | (is_fr & ~lin_neg & ~lin_pos) | (is_one & (x < 0.0))
      d1_rows = jnp.where(quad, D * x * jv, 0.0)
      d1_rows = d1_rows + jnp.where(lin_neg, -fl * jv, 0.0)
      d1_rows = d1_rows + jnp.where(lin_pos, fl * jv, 0.0)
      d2_rows = jnp.where(quad, D * jv * jv, 0.0)
      d1 = g0 + alpha * h0 + jnp.sum(d1_rows, axis=0, keepdims=True)
      d2 = h0 + jnp.sum(d2_rows, axis=0, keepdims=True)
      return d1, d2

    zero = jnp.zeros((1, L), dt)
    p1_0, p2_0 = phi_d(zero)
    alpha0 = jnp.maximum(-p1_0 / jnp.maximum(p2_0, _MINVAL), 0.0)

    scales = np.logspace(-3.0, 0.7, ls_k)
    # bracket the root of the piecewise-linear monotone phi'
    lo = jnp.zeros((1, L), dt)
    p1_lo = p1_0
    hi = jnp.full((1, L), jnp.inf, dt)
    p1_hi = jnp.full((1, L), jnp.inf, dt)
    for s in scales:
      a = alpha0 * np.float32(s)
      p1_a, _ = phi_d(a)
      neg = p1_a < 0
      lo = jnp.where(neg, a, lo)
      p1_lo = jnp.where(neg, p1_a, p1_lo)
      first_pos = (~neg) & (~jnp.isfinite(hi))
      hi = jnp.where(first_pos, a, hi)
      p1_hi = jnp.where(first_pos, p1_a, p1_hi)
    any_hi = jnp.isfinite(hi)
    denom = jnp.where(jnp.abs(p1_hi - p1_lo) < _MINVAL, 1.0, p1_hi - p1_lo)
    secant = lo - p1_lo * (hi - lo) / denom
    a_max = alpha0 * np.float32(scales[-1])
    p1_m, p2_m = phi_d(a_max)
    newton_tail = a_max - p1_m / jnp.maximum(p2_m, _MINVAL)
    alpha = jnp.where(any_hi, secant, jnp.maximum(newton_tail, 0.0))
    alpha_cap = 10.0 * a_max
    for _ in range(3):
      p1_a, p2_a = phi_d(alpha)
      alpha = alpha - p1_a / jnp.maximum(p2_a, _MINVAL)
      alpha = jnp.clip(alpha, 0.0, alpha_cap)
    return jnp.where(p1_0 >= 0, 0.0, alpha)

  # ---- init (reference solver.py:3257) ----
  qacc = ws_ref[...] if use_ws else qacc_smooth
  ma = matvec_qm(qacc)
  jaref = matvec_j(qacc) - aref_ref[...]
  force, cost_c, quad = update_constraint(jaref)
  cost = cost_c + gauss_cost(qacc, ma)
  grad = ma - qfs - matvec_jt(force)
  mgrad = newton_mgrad(grad, quad)
  gradnorm = jnp.sqrt(jnp.sum(grad * grad, axis=0, keepdims=True))
  done = gradnorm / rescale_den < tol

  # loop state lives in VMEM refs; the while carry is ONE scalar —
  # Mosaic legalizes scalar carries + ref mutation, not big value
  # carries with layout changes across iterations
  qacc_ref[...] = qacc
  ma_scr[...] = ma
  jaref_scr[...] = jaref
  search_scr[...] = -mgrad
  cost_scr[...] = cost
  done_scr[...] = done.astype(dt)
  niter_ref[...] = jnp.zeros((1, L), jnp.int32)

  def body(_):
    qacc = qacc_ref[...]
    ma = ma_scr[...]
    jaref = jaref_scr[...]
    search = search_scr[...]
    cost = cost_scr[...]
    done = done_scr[...] > 0.5
    niter = niter_ref[...]

    jv = matvec_j(search)
    mv = matvec_qm(search)
    alpha = linesearch(jaref, search, ma, jv, mv)
    alpha = jnp.where(done, 0.0, alpha)
    qacc = qacc + alpha * search
    ma = ma + alpha * mv
    jaref = jaref + alpha * jv
    force, cost_c, quad = update_constraint(jaref)
    newcost = cost_c + gauss_cost(qacc, ma)
    grad = ma - qfs - matvec_jt(force)
    mgrad = newton_mgrad(grad, quad)
    improvement = (cost - newcost) / rescale_den
    gradnorm = jnp.sqrt(jnp.sum(grad * grad, axis=0,
                                keepdims=True)) / rescale_den
    niter = niter + jnp.where(done, 0, 1)
    newdone = done | (improvement < tol) | (gradnorm < tol) | (
        niter >= iterations)

    qacc_ref[...] = qacc
    ma_scr[...] = ma
    jaref_scr[...] = jaref
    search_scr[...] = jnp.where(done, search, -mgrad)
    cost_scr[...] = jnp.where(done, cost, newcost)
    done_scr[...] = newdone.astype(dt)
    niter_ref[...] = niter
    return ~jnp.all(newdone)

  jax.lax.while_loop(lambda go: go, body, ~jnp.all(done))

  force, _, _ = update_constraint(jaref_scr[...])
  qfc = matvec_jt(force)
  qfc_ref[...] = qfc
  force_ref[...] = force

  if euler_damp:
    # semi-implicit Euler damping solve folded in (reference
    # forward.py:327 mj_Euler): (qM + h diag(B)) qacc' = qfrc_smooth +
    # qfrc_constraint, reusing the resident qM rows
    def row_with_diag(i):
      row = qm_ref[i]
      parts = []
      if i > 0:
        parts.append(row[:i])
      parts.append(row[i:i + 1] + hb_ref[i, 0])
      if i < nv - 1:
        parts.append(row[i + 1:])
      return jnp.concatenate(parts, axis=0)
    cols_e = _chol_cols(nv, row_with_diag)
    qacce_ref[...] = _chol_solve(nv, cols_e, qfs + qfc)
  else:
    qacce_ref[...] = qacc_ref[...]


@functools.partial(jax.jit, static_argnames=('ne', 'nf', 'iterations',
                                             'ls_k', 'use_ws',
                                             'interpret', 'euler_damp'))
def newton_solve_batched(qm, efc_j, efc_d, efc_aref, efc_fl, qfrc_smooth,
                         warmstart, tolerance, meaninertia, hb=None, *,
                         ne, nf, iterations, ls_k=10, use_ws=True,
                         interpret=False, euler_damp=False):
  """Batched Newton solve. All inputs (W, ...) batch-first; returns
  (qacc, qfrc_constraint, efc_force, niter, qacc_smooth, qLD)."""
  W, nj, nv = efc_j.shape
  wpad = -(-W // LANES) * LANES
  dt = qm.dtype

  def bl(x):
    x = jnp.moveaxis(x, 0, -1)
    if wpad != W:
      x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, wpad - W),))
    return x

  qm_t = bl(qm)
  if wpad != W:  # keep padded-lane factorization finite
    eye = jnp.eye(nv, dtype=dt)[:, :, None]
    pad_mask = jnp.arange(wpad) >= W
    qm_t = jnp.where(pad_mask[None, None, :], eye, qm_t)
  params = jnp.stack([tolerance.astype(dt).reshape(()),
                      meaninertia.astype(dt).reshape(())])[:, None]

  cfg = (nv, nj, ne, nf, iterations, ls_k, use_ws, euler_damp)
  if hb is None:
    hb = jnp.zeros((nv,), dt)
  kernel = functools.partial(_newton_kernel, cfg)
  vm = pltpu.VMEM
  lane2 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                 memory_space=vm)
  lane3 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                    memory_space=vm)
  outs = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      interpret=interpret,
      in_specs=[
          pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=vm),
          lane3(nv, nv), lane3(nv, nj), lane2(nj), lane2(nj), lane2(nj),
          lane2(nv), lane2(nv),
          pl.BlockSpec((nv, 1), lambda i: (0, 0), memory_space=vm),
      ],
      out_specs=[lane2(nv), lane2(nv), lane2(nj),
                 pl.BlockSpec((1, LANES), lambda i: (0, i),
                              memory_space=vm),
                 lane2(nv), lane3(nv, nv), lane2(nv)],
      out_shape=[
          jax.ShapeDtypeStruct((nv, wpad), dt),
          jax.ShapeDtypeStruct((nv, wpad), dt),
          jax.ShapeDtypeStruct((nj, wpad), dt),
          jax.ShapeDtypeStruct((1, wpad), jnp.int32),
          jax.ShapeDtypeStruct((nv, wpad), dt),
          jax.ShapeDtypeStruct((nv, nv, wpad), dt),
          jax.ShapeDtypeStruct((nv, wpad), dt),
      ],
      scratch_shapes=[pltpu.VMEM((nv, nv, LANES), jnp.float32),
                      pltpu.VMEM((nv, nj, LANES), jnp.float32),
                      pltpu.VMEM((nv, LANES), jnp.float32),
                      pltpu.VMEM((nj, LANES), jnp.float32),
                      pltpu.VMEM((nv, LANES), jnp.float32),
                      pltpu.VMEM((1, LANES), jnp.float32),
                      pltpu.VMEM((1, LANES), jnp.float32)],
  )(params, qm_t, jnp.swapaxes(bl(efc_j), 0, 1), bl(efc_d),
    bl(efc_aref), bl(efc_fl), bl(qfrc_smooth), bl(warmstart),
    hb.astype(dt)[:, None])
  t2 = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  qacc, qfc, force, niter, qacc_smooth, qld, qacc_euler = outs
  return (t2(qacc), t2(qfc), t2(force), t2(niter)[:, 0], t2(qacc_smooth),
          t2(qld), t2(qacc_euler))
