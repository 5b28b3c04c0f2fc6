"""Constraint solver: projected Newton and CG on the primal qacc problem
(reference: mujoco_warp/_src/solver.py; C mj_solPrimal).

TPU-native structure: the whole solve is one ``lax.while_loop`` whose
carried state is a small pytree; per-world convergence uses a ``done``
flag folded into every update — the XLA equivalent of the reference's
conditional CUDA graph ``wp.capture_while`` + per-world early-outs
(solver.py:3327-3343, 3151-3254).

All math is written **batch-polymorphic**: arrays are (..., nj, nv) /
(..., nj) with an optional leading world axis. ``solve`` is used both
single-world (tests, vmap fallback) and batch-native (the perf path,
``forward.step_batched``), where the per-iteration Newton system is
solved by ONE Pallas kernel over all worlds (pallas/batch_linalg.py)
instead of thousands of unfused scalar ops — the role the reference's
tiled Cholesky + MathDx GEMMs play (solver.py:2368,2732).

The linesearch is the exact convex piecewise-quadratic minimization
(reference's iterative variant, solver.py:887-1343) implemented as a
fixed-iteration safeguarded-Newton bisection over masked row quadratics —
branch-free, so it vectorizes over worlds.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from . import linalg
from .types import (ConeType, ConstraintType, Data, DisableBit, Model,
                    SolverType)

_MINVAL = 1e-15
_EINSUM = dict(precision=jax.lax.Precision.HIGHEST)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Ctx:
  qacc: jax.Array
  Ma: jax.Array          # M @ qacc
  jaref: jax.Array       # J @ qacc - aref
  force: jax.Array       # efc forces
  qfrc_constraint: jax.Array
  grad: jax.Array
  mgrad: jax.Array
  search: jax.Array
  prev_grad: jax.Array
  prev_mgrad: jax.Array
  cost: jax.Array
  prev_cost: jax.Array
  solver_niter: jax.Array
  done: jax.Array


def _pallas_ok() -> tuple:
  """(run Pallas lane kernels?, interpret mode?)."""
  import os
  on_tpu = jax.default_backend() == 'tpu'
  force = os.environ.get('MJWT_FORCE_MEGA', '0') == '1'
  return on_tpu or force, force and not on_tpu


def _tree_ldl_ok(m: Model, nv: int) -> bool:
  """Use the tree-sparse LDL kernel for M-structured solves: above the
  dense values-kernel sweet spot, the O(sum depth) schedule beats the
  O(nv^2) dense column loop AND keeps Mosaic compile time linear
  (reference sparse path: smooth.py:1017-1104)."""
  import os
  if os.environ.get('MJWT_TREE_LDL', '1') == '0':
    return False
  return nv > 32 and len(m.dof_parentid) == nv


def _tree_ldl_probed(m: Model, w: int, nv: int, dtype) -> bool:
  """Mosaic probe for the tree-LDL factor+solve kernel PAIR at this
  (W, nv). Both m_solve_factor and m_cho_solve gate on this one key so
  the packed-LD factor layout and its consumer always agree. (Round-4
  finding: the kernel compiles at grid=1 but the Mosaic compile helper
  dies at grid>=2 for nv=81/three_humanoids — fallback, don't crash.)"""
  import functools as _ft

  from .pallas import batch_linalg, probe
  key = (f'tree_ldl:nv{nv}:w{w}:'
         f'{hash(m.dof_parentid) & 0xffffffffffff:x}')

  def build():
    a = jax.ShapeDtypeStruct((w, nv, nv), dtype)
    b = jax.ShapeDtypeStruct((w, nv), dtype)
    jax.jit(_ft.partial(
        batch_linalg.tree_ldl_solve_batched, parentid=m.dof_parentid,
        return_factor=True)).lower(a, b).compile()
    jax.jit(_ft.partial(
        batch_linalg.tree_solve_from_factor_batched,
        parentid=m.dof_parentid)).lower(a, b).compile()
  return probe.probe(key, build)


def _dense_chol_probed(w: int, nv: int, dtype) -> bool:
  """Mosaic probe for the dense lane-Cholesky kernel pair."""
  import functools as _ft

  from .pallas import batch_linalg, probe
  key = f'dense_chol:nv{nv}:w{w}'

  def build():
    a = jax.ShapeDtypeStruct((w, nv, nv), dtype)
    b = jax.ShapeDtypeStruct((w, nv), dtype)
    jax.jit(_ft.partial(batch_linalg.spd_solve_batched,
                        return_factor=True)).lower(a, b).compile()
    jax.jit(batch_linalg.cho_solve_batched).lower(a, b).compile()
  return probe.probe(key, build)


def spd_solve(m: Model, a: jax.Array, b: jax.Array) -> jax.Array:
  """SPD solve, dispatched: Pallas lane-batched kernel on TPU for
  batched inputs, unrolled scalar version otherwise (LAPACK-style
  jnp.linalg above nv=32, where unrolling blows up compile time).

  NOTE: for M-structured matrices prefer m_solve_* (tree-sparse LDL);
  this entry serves general SPD systems (Newton Hessians)."""
  if (a.ndim == 3 and jax.default_backend() == 'tpu' and
      a.shape[-1] <= 96 and
      _dense_chol_probed(a.shape[0], a.shape[-1], a.dtype)):
    from .pallas import batch_linalg
    return batch_linalg.spd_solve_batched(a, b)
  # any nv: linalg.spd_solve is unrolled below 32 and BLOCKED above
  # (never XLA's batched cholesky/solve custom-calls — r5 profile:
  # three_humanoids nv=81 spent its 406 ms/step almost entirely in
  # batched jnp.linalg.solve here)
  if a.ndim == 3:
    return jax.vmap(linalg.spd_solve)(a, b)
  return linalg.spd_solve(a, b)


def m_solve_factor(m: Model, a: jax.Array, b: jax.Array,
                   diag: jax.Array | None = None):
  """Factor + solve for MASS-MATRIX-structured systems (A = qM [+ diag],
  kinematic-tree sparsity). Returns (x, factor); the factor layout is
  the packed tree LD when the tree kernel dispatched and the packed
  sparse LD when the model is in sparse-qM mode (pair with m_cho_solve,
  never batch_linalg.cho_solve_batched)."""
  if m.qm_meta is not None:                 # packed (..., nM) values
    from . import sparse as sparse_mod
    return sparse_mod.factor_solve(m.qm_meta, a, b, diag=diag)
  pallas, interp = _pallas_ok()
  if (a.ndim == 3 and pallas and _tree_ldl_ok(m, a.shape[-1]) and
      _tree_ldl_probed(m, a.shape[0], a.shape[-1], a.dtype)):
    from .pallas import batch_linalg
    return batch_linalg.tree_ldl_solve_batched(
        a, b, m.dof_parentid, diag=diag, return_factor=True,
        interpret=interp)
  if diag is not None:
    dmat = jnp.diag(diag)
    a = a + (dmat[None] if a.ndim == 3 else dmat)
  return spd_solve_factor(m, a, b)


def m_cho_solve(m: Model, fac: jax.Array, b: jax.Array) -> jax.Array:
  """Solve from the factor produced by m_solve_factor."""
  if m.qm_meta is not None:
    from . import sparse as sparse_mod
    return sparse_mod.solve(m.qm_meta, fac, b)
  pallas, interp = _pallas_ok()
  if (fac.ndim == 3 and pallas and _tree_ldl_ok(m, fac.shape[-1]) and
      _tree_ldl_probed(m, fac.shape[0], fac.shape[-1], fac.dtype)):
    from .pallas import batch_linalg
    return batch_linalg.tree_solve_from_factor_batched(
        fac, b, m.dof_parentid, interpret=interp)
  return cho_solve(m, fac, b)


def spd_solve_factor(m: Model, a: jax.Array, b: jax.Array):
  """Batched SPD factor + solve; returns (x, L)."""
  if (a.ndim == 3 and jax.default_backend() == 'tpu' and
      a.shape[-1] <= 96 and
      _dense_chol_probed(a.shape[0], a.shape[-1], a.dtype)):
    from .pallas import batch_linalg
    return batch_linalg.spd_solve_batched(a, b, return_factor=True)
  # linalg.cholesky/cho_solve: unrolled below 32, blocked above (no XLA
  # batched-cholesky custom calls — see spd_solve)
  if a.ndim == 3:
    l = jax.vmap(linalg.cholesky)(a)
    return jax.vmap(linalg.cho_solve)(l, b), l
  l = linalg.cholesky(a)
  return linalg.cho_solve(l, b), l


def cho_solve(m: Model, l: jax.Array, b: jax.Array) -> jax.Array:
  if (l.ndim == 3 and jax.default_backend() == 'tpu' and
      l.shape[-1] <= 96 and
      _dense_chol_probed(l.shape[0], l.shape[-1], l.dtype)):
    from .pallas import batch_linalg
    return batch_linalg.cho_solve_batched(l, b)
  if l.ndim == 3:
    return jax.vmap(linalg.cho_solve)(l, b)
  return linalg.cho_solve(l, b)


def _mul_qm(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """qM @ x, dense or packed-sparse depending on the model mode."""
  if m.qm_meta is not None:
    from . import sparse as sparse_mod
    return sparse_mod.mul_m(m.qm_meta, d.qM, x)
  return jnp.einsum('...ij,...j->...i', d.qM, x, **_EINSUM)


def _rescale(m: Model, value):
  return value / (jnp.maximum(m.stat.meaninertia, _MINVAL) *
                  jnp.maximum(1, m.nv))


def _row_masks(m: Model, efc_type):
  is_eq = efc_type == ConstraintType.EQUALITY
  is_fr = (efc_type == ConstraintType.FRICTION_DOF) | (
      efc_type == ConstraintType.FRICTION_TENDON)
  is_ell = efc_type == ConstraintType.CONTACT_ELLIPTIC
  is_oneside = ~is_eq & ~is_fr & ~is_ell
  return is_eq, is_fr, is_oneside


def _elliptic_layout(m: Model, d: Data):
  """Static (base, stride) of the contact row block, or None when the
  model has no elliptic contacts."""
  if m.opt.cone != ConeType.ELLIPTIC:
    return None
  nconmax = d.contact.dist.shape[-1]
  from . import io as io_mod
  ne, nf, nl, stride, njmax = io_mod.efc_layout(m, nconmax)
  if nconmax == 0 or stride < 2:
    return None
  return ne + nf + nl, stride, nconmax


def _elliptic_quantities(m: Model, d: Data, jaref):
  """Per-contact cone quantities from the contact block of jaref:
  returns (N, T, u, mu, s, is_ell_con) with shapes (..., C) / (..., C, S).
  u is the cone-scaled row vector (row 0 scaled by mu, friction rows by
  their own coefficient); s the per-row scale factors."""
  lay = _elliptic_layout(m, d)
  base, S, C = lay
  x = jaref[..., base:base + C * S]
  x = x.reshape(x.shape[:-1] + (C, S))
  friction = d.contact.friction                    # (..., C, 5)
  dim = d.contact.dim                              # (..., C)
  mu = friction[..., 0] / jnp.sqrt(jnp.maximum(m.opt.impratio, _MINVAL))
  import numpy as np
  r = np.arange(S)
  fr_row = friction[..., np.clip(r - 1, 0, 4)]     # (..., C, S)
  s = jnp.where(jnp.asarray(r == 0), mu[..., None], fr_row)  # (..., C, S)
  rowvalid = (jnp.asarray(r) < jnp.maximum(dim[..., None], 1)) & (
      jnp.asarray(r == 0) | (dim[..., None] > 1))
  u = x * s * rowvalid
  N = u[..., 0]
  T = jnp.sqrt(jnp.maximum(jnp.sum(u[..., 1:] ** 2, axis=-1), 0.0))
  is_ell_con = (dim > 1) & (d.contact.geom[..., 0] >= 0)
  return base, S, C, x, u, N, T, mu, s, rowvalid, is_ell_con


def _elliptic_zones(N, T, mu):
  top = N >= mu * T
  bottom = ~top & (mu * N + T <= 0)
  middle = ~top & ~bottom
  return top, bottom, middle


def _update_constraint(m: Model, d: Data, jaref):
  """Per-row force, cost, active state (reference solver.py:1805-1953).
  jaref: (..., nj). Returns (force, qfrc_constraint, cost, quad,
  cone_middle) where cone_middle (or None) marks elliptic contacts in
  the middle (cone-surface) zone."""
  is_eq, is_fr, is_one = _row_masks(m, d.efc_type)
  D = d.efc_D
  fl = d.efc_frictionloss
  rf = fl / jnp.maximum(D, _MINVAL)

  lin_neg = is_fr & (jaref <= -rf)
  lin_pos = is_fr & (jaref >= rf)
  quad_fr = is_fr & ~lin_neg & ~lin_pos
  quad_one = is_one & (jaref < 0.0)
  quad = is_eq | quad_fr | quad_one

  force = jnp.where(quad, -D * jaref, 0.0)
  force = jnp.where(lin_neg, fl, force)
  force = jnp.where(lin_pos, -fl, force)

  cost_rows = jnp.where(quad, 0.5 * D * jaref * jaref, 0.0)
  cost_rows = jnp.where(lin_neg, -fl * (0.5 * rf + jaref), cost_rows)
  cost_rows = jnp.where(lin_pos, -fl * (0.5 * rf - jaref), cost_rows)

  cone_middle = None
  if _elliptic_layout(m, d) is not None:
    # elliptic contacts: zone logic per contact block (reference
    # update_constraint_efc elliptic branch)
    (base, S, C, x, u, N, T, mu, s, rowvalid,
     is_ell) = _elliptic_quantities(m, d, jaref)
    top, bottom, middle = _elliptic_zones(N, T, mu)
    top, bottom, middle = [z & is_ell for z in (top, bottom, middle)]
    Dblk = d.efc_D[..., base:base + C * S]
    Dblk = Dblk.reshape(Dblk.shape[:-1] + (C, S))
    d0 = Dblk[..., 0]
    mu2 = mu * mu
    dm = d0 / jnp.maximum(mu2 * (1.0 + mu2), _MINVAL)
    nmt = N - mu * T
    f_norm = -dm * nmt * mu
    Tsafe = jnp.maximum(T, _MINVAL)
    f_fric = -f_norm[..., None] / Tsafe[..., None] * (u * s)
    f_mid = jnp.concatenate([f_norm[..., None], f_fric[..., 1:]], axis=-1)
    f_bot = -Dblk * x
    f_blk = jnp.where(middle[..., None], f_mid,
                      jnp.where(bottom[..., None], f_bot, 0.0)) * rowvalid
    c_mid = 0.5 * dm * nmt * nmt
    c_bot = jnp.sum(0.5 * Dblk * x * x * rowvalid, axis=-1)
    c_blk = jnp.where(middle, c_mid, jnp.where(bottom, c_bot, 0.0))
    # merge: replace rows of elliptic contacts in the flat arrays
    ell_rows = jnp.broadcast_to(is_ell[..., None],
                                is_ell.shape + (S,)).reshape(
        is_ell.shape[:-1] + (C * S,))
    force = force.at[..., base:base + C * S].set(
        jnp.where(ell_rows, f_blk.reshape(f_blk.shape[:-2] + (C * S,)),
                  force[..., base:base + C * S]))
    # cost: zero out the elliptic rows' independent cost, add block cost
    cost_rows = cost_rows.at[..., base:base + C * S].set(
        jnp.where(ell_rows, 0.0, cost_rows[..., base:base + C * S]))
    cost_rows = cost_rows.at[..., base].add(
        jnp.sum(jnp.where(is_ell, c_blk, 0.0), axis=-1))
    # quad flag: elliptic rows quadratic only in the bottom zone
    quad_blk = jnp.broadcast_to((bottom & is_ell)[..., None],
                                bottom.shape + (S,)) & rowvalid
    quad = quad.at[..., base:base + C * S].set(
        jnp.where(ell_rows,
                  quad_blk.reshape(quad_blk.shape[:-2] + (C * S,)),
                  quad[..., base:base + C * S]))
    cone_middle = middle & is_ell

  cost = jnp.sum(cost_rows, axis=-1)
  qfrc_constraint = jnp.einsum('...jn,...j->...n', d.efc_J, force,
                               **_EINSUM)
  return force, qfrc_constraint, cost, quad, cone_middle


def _gauss_cost(m: Model, d: Data, qacc, ma):
  return 0.5 * jnp.sum((ma - d.qfrc_smooth) * (qacc - d.qacc_smooth),
                       axis=-1)


def _update_gradient(m: Model, d: Data, ctx_grad_inputs, jaref=None,
                     cone_middle=None):
  """grad, and Mgrad via Newton Hessian or CG preconditioner."""
  ma, qfrc_constraint, quad = ctx_grad_inputs
  grad = ma - d.qfrc_smooth - qfrc_constraint
  if m.opt.solver == SolverType.NEWTON:
    dh = d.efc_D * quad.astype(d.efc_D.dtype)
    # H = M + J^T diag(Dh) J — MXU batched matmul (reference solver.py:2368)
    jd = d.efc_J * dh[..., None]
    h = d.qM + jnp.einsum('...jn,...jk->...nk', jd, d.efc_J, **_EINSUM)
    if cone_middle is not None:
      # elliptic cone-surface Hessian correction H += Jc^T C Jc per
      # middle-zone contact (reference update_gradient_JTCJ math)
      (base, S, C, x, u, N, T, mu, s, rowvalid,
       is_ell) = _elliptic_quantities(m, d, jaref)
      Dblk = d.efc_D[..., base:base + C * S]
      d0 = Dblk.reshape(Dblk.shape[:-1] + (C, S))[..., 0]
      mu2 = mu * mu
      dm = d0 / jnp.maximum(mu2 * (1.0 + mu2), _MINVAL)
      Tsafe = jnp.maximum(T, _MINVAL)
      T3 = jnp.maximum(T * Tsafe * Tsafe, _MINVAL)
      import numpy as np
      r = np.arange(S)
      is0 = jnp.asarray(r == 0)
      # hcone in scaled coordinates (..., C, S, S)
      ui = u[..., :, None]
      uj = u[..., None, :]
      hc = (mu[..., None, None] * N[..., None, None] / T3[..., None, None]
            ) * ui * uj
      diag = jnp.eye(S, dtype=u.dtype)
      hc = hc + diag * (mu2 - mu * N / Tsafe)[..., None, None]
      # first row/column overrides
      mu_over_t = (mu / Tsafe)[..., None]
      hc = hc.at[..., 0, :].set(-mu_over_t * u)
      hc = hc.at[..., :, 0].set(-mu_over_t * u)
      hc = hc.at[..., 0, 0].set(1.0)
      scale = dm[..., None, None] * s[..., :, None] * s[..., None, :]
      mask = (cone_middle[..., None, None] &
              rowvalid[..., :, None] & rowvalid[..., None, :])
      Cblk = hc * scale * mask
      Jc = d.efc_J[..., base:base + C * S, :]
      Jc = Jc.reshape(Jc.shape[:-2] + (C, S, Jc.shape[-1]))
      h = h + jnp.einsum('...csn,...cst,...ctk->...nk', Jc, Cblk, Jc,
                         **_EINSUM)
      # f32 guard: the cone Hessian is PSD in exact arithmetic but can
      # round indefinite when impratio skews the row scales; a relative
      # Tikhonov floor keeps the factorization sane (error ~1e-7 rel,
      # far below the solver tolerance floor)
      nv = h.shape[-1]
      tr = jnp.trace(h, axis1=-2, axis2=-1) / nv
      h = h + (1e-7 * tr)[..., None, None] * jnp.eye(nv, dtype=h.dtype)
    mgrad = spd_solve(m, h, grad)
  else:
    mgrad = m_cho_solve(m, d.qLD, grad)
  return grad, mgrad


def _linesearch(m: Model, d: Data, ctx: _Ctx):
  """Exact convex piecewise-quadratic linesearch along ctx.search.
  All scalars are (...,) shaped (one per world)."""
  p = ctx.search
  mv = _mul_qm(m, d, p)
  jv = jnp.einsum('...jn,...n->...j', d.efc_J, p, **_EINSUM)

  # gauss quadratic: phi_g'(a) = g0 + a h0
  g0 = jnp.sum(p * (ctx.Ma - d.qfrc_smooth), axis=-1)
  h0 = jnp.sum(p * mv, axis=-1)

  is_eq, is_fr, is_one = _row_masks(m, d.efc_type)
  D = d.efc_D
  fl = d.efc_frictionloss
  rf = fl / jnp.maximum(D, _MINVAL)
  jaref = ctx.jaref

  ell = _elliptic_layout(m, d)
  if ell is not None:
    (base, S, C, x0blk, u0blk, _, _, mu_e, s_e, rowvalid_e,
     is_ell_con) = _elliptic_quantities(m, d, jaref)
    jvblk = jv[..., base:base + C * S]
    jvblk = jvblk.reshape(jvblk.shape[:-1] + (C, S)) * rowvalid_e
    vblk = jvblk * s_e                       # scaled jv rows
    Dblk_e = d.efc_D[..., base:base + C * S]
    Dblk_e = Dblk_e.reshape(Dblk_e.shape[:-1] + (C, S))
    d0_e = Dblk_e[..., 0]
    mu2_e = mu_e * mu_e
    dm_e = d0_e / jnp.maximum(mu2_e * (1.0 + mu2_e), _MINVAL)

  def phi_d(alpha):
    """(phi'(alpha), phi''(alpha)) — (...,) each; alpha (...,)."""
    x = jaref + alpha[..., None] * jv
    lin_neg = is_fr & (x <= -rf)
    lin_pos = is_fr & (x >= rf)
    quad = is_eq | (is_fr & ~lin_neg & ~lin_pos) | (is_one & (x < 0.0))
    d1_rows = jnp.where(quad, D * x * jv, 0.0)
    d1_rows = d1_rows + jnp.where(lin_neg, -fl * jv, 0.0)
    d1_rows = d1_rows + jnp.where(lin_pos, fl * jv, 0.0)
    d2_rows = jnp.where(quad, D * jv * jv, 0.0)
    d1 = g0 + alpha * h0 + jnp.sum(d1_rows, axis=-1)
    d2 = h0 + jnp.sum(d2_rows, axis=-1)
    if ell is not None:
      # cone contribution per elliptic contact (reference _eval_elliptic)
      xb = x[..., base:base + C * S]
      xb = xb.reshape(xb.shape[:-1] + (C, S)) * rowvalid_e
      ub = xb * s_e
      Na = ub[..., 0]
      N1 = vblk[..., 0]
      Ta = jnp.sqrt(jnp.maximum(jnp.sum(ub[..., 1:] ** 2, axis=-1),
                                _MINVAL))
      T1 = jnp.sum(ub[..., 1:] * vblk[..., 1:], axis=-1) / Ta
      T2 = (jnp.sum(vblk[..., 1:] ** 2, axis=-1) - T1 * T1) / Ta
      top, bottom, middle = _elliptic_zones(Na, Ta, mu_e)
      top, bottom, middle = [z & is_ell_con for z in (top, bottom, middle)]
      nmt = Na - mu_e * Ta
      n1mt1 = N1 - mu_e * T1
      d1_mid = dm_e * nmt * n1mt1
      d2_mid = dm_e * (n1mt1 * n1mt1 - nmt * mu_e * T2)
      d1_bot = jnp.sum(Dblk_e * xb * jvblk, axis=-1)
      d2_bot = jnp.sum(Dblk_e * jvblk * jvblk, axis=-1)
      d1 = d1 + jnp.sum(jnp.where(middle, d1_mid,
                                  jnp.where(bottom, d1_bot, 0.0)),
                        axis=-1)
      d2 = d2 + jnp.sum(jnp.where(middle, d2_mid,
                                  jnp.where(bottom, d2_bot, 0.0)),
                        axis=-1)
    return d1, d2

  zero = jnp.zeros_like(g0)
  p1_0, p2_0 = phi_d(zero)
  alpha0 = -p1_0 / jnp.maximum(p2_0, _MINVAL)
  alpha0 = jnp.maximum(alpha0, 0.0)

  if m.opt.ls_parallel:
    # Parallel multi-alpha linesearch (reference solver.py:481): phi' is
    # piecewise-LINEAR monotone (the cost is piecewise quadratic), so
    # bracket the root over log-spaced candidates around the
    # unconstrained Newton step, then one secant (exact within a piece)
    # + one Newton polish. ~6 fused kernels total instead of the
    # iterative variant's ~100 (fusion-barrier count is what TPU
    # dispatch pays for, not FLOPs).
    K = 10
    scales = jnp.logspace(-3.0, 0.7, K).astype(jaref.dtype)  # 1e-3..5
    alphas = alpha0[..., None] * scales          # (..., K)
    p1_k, _ = jax.vmap(phi_d, in_axes=-1, out_axes=-1)(alphas)
    # lo = largest candidate with phi' < 0; hi = smallest with phi' >= 0
    neg = p1_k < 0
    any_neg = jnp.any(neg, axis=-1)
    big = jnp.full_like(alphas, jnp.inf)
    # phi' is monotone: the largest negative-phi' candidate is the
    # bracket's lower end; alpha=0 (where phi' = p1_0 < 0) is the
    # implicit lower end when every candidate is already positive
    lo = jnp.where(any_neg, jnp.max(jnp.where(neg, alphas, 0.0), axis=-1),
                   0.0)
    p1_lo = jnp.where(any_neg,
                      jnp.max(jnp.where(neg, p1_k, -jnp.inf), axis=-1),
                      p1_0)
    hi = jnp.min(jnp.where(neg, big, alphas), axis=-1)
    p1_hi = jnp.min(jnp.where(neg, big, p1_k), axis=-1)
    any_hi = jnp.isfinite(hi)
    # secant within the bracket (exact if no kink between lo and hi)
    denom = jnp.where(jnp.abs(p1_hi - p1_lo) < _MINVAL, 1.0, p1_hi - p1_lo)
    secant = lo - p1_lo * (hi - lo) / denom
    # no bracket above: Newton from the largest candidate
    a_max = alphas[..., -1]
    p1_m, p2_m = phi_d(a_max)
    newton_tail = a_max - p1_m / jnp.maximum(p2_m, _MINVAL)
    alpha = jnp.where(any_hi, secant, jnp.maximum(newton_tail, 0.0))
    # Newton polish: converges across remaining kinks (phi convex).
    # Cap the step at a multiple of the largest bracket candidate so a
    # near-zero phi'' (f32) cannot launch a divergent alpha.
    alpha_cap = 10.0 * a_max
    for _ in range(3):
      p1_a, p2_a = phi_d(alpha)
      alpha = alpha - p1_a / jnp.maximum(p2_a, _MINVAL)
      alpha = jnp.clip(alpha, 0.0, alpha_cap)
    alpha = jnp.where(p1_0 >= 0, 0.0, alpha)
    return alpha, mv, jv

  def body(_, state):
    alpha, lo, hi, has_hi, done_ls = state
    p1, p2 = phi_d(alpha)
    new_lo = jnp.where(p1 < 0, alpha, lo)
    new_hi = jnp.where(p1 >= 0, alpha, hi)
    new_has_hi = has_hi | (p1 >= 0)
    newton = alpha - p1 / jnp.maximum(p2, _MINVAL)
    grow = jnp.maximum(newton, 2.0 * jnp.maximum(alpha, 1.0))
    bisect = 0.5 * (new_lo + new_hi)
    in_bracket = (newton > new_lo) & (newton < new_hi)
    nxt = jnp.where(new_has_hi,
                    jnp.where(in_bracket, newton, bisect), grow)
    tol = m.opt.ls_tolerance * jnp.maximum(
        m.stat.meaninertia, _MINVAL) * jnp.maximum(1, m.nv)
    new_done = done_ls | (jnp.abs(p1) < tol)
    alpha = jnp.where(new_done, alpha, nxt)
    return alpha, new_lo, new_hi, new_has_hi, new_done

  state = (alpha0, zero, alpha0, jnp.zeros_like(p1_0, bool), p1_0 >= 0)
  alpha, *_ = jax.lax.fori_loop(0, m.opt.ls_iterations, body, state)
  alpha = jnp.where(p1_0 >= 0, 0.0, alpha)
  return alpha, mv, jv


def _iteration(m: Model, d: Data, ctx: _Ctx) -> _Ctx:
  alpha, mv, jv = _linesearch(m, d, ctx)
  qacc = ctx.qacc + alpha[..., None] * ctx.search
  ma = ctx.Ma + alpha[..., None] * mv
  jaref = ctx.jaref + alpha[..., None] * jv

  force, qfrc_constraint, cost_c, quad, cone_mid = _update_constraint(
      m, d, jaref)
  cost = cost_c + _gauss_cost(m, d, qacc, ma)
  grad, mgrad = _update_gradient(m, d, (ma, qfrc_constraint, quad),
                                 jaref=jaref, cone_middle=cone_mid)

  if m.opt.solver == SolverType.CG:
    beta_num = jnp.sum(grad * (mgrad - ctx.prev_mgrad), axis=-1)
    beta_den = jnp.maximum(jnp.sum(ctx.prev_grad * ctx.prev_mgrad, axis=-1),
                           _MINVAL)
    beta = jnp.maximum(0.0, beta_num / beta_den)
    search = -mgrad + beta[..., None] * ctx.search
    prev_grad, prev_mgrad = grad, mgrad
  else:
    # Newton: search IS -mgrad; keep the CG-only carries dead (zeros)
    # so the while_loop carry stays small (copies cost real time)
    search = -mgrad
    prev_grad, prev_mgrad = ctx.prev_grad, ctx.prev_mgrad

  improvement = _rescale(m, ctx.cost - cost)
  gradient = _rescale(m, jnp.sqrt(jnp.sum(grad * grad, axis=-1)))
  niter = ctx.solver_niter + 1
  done = ctx.done | (improvement < m.opt.tolerance) | (
      gradient < m.opt.tolerance) | (niter >= m.opt.iterations)

  # masked commit: converged worlds keep their state
  def sel(new, old):
    dmask = ctx.done
    if new.ndim > dmask.ndim:
      dmask = dmask[..., None]
    return jnp.where(dmask, old, new)

  new_ctx = _Ctx(
      qacc=sel(qacc, ctx.qacc), Ma=sel(ma, ctx.Ma),
      jaref=sel(jaref, ctx.jaref), force=sel(force, ctx.force),
      qfrc_constraint=sel(qfrc_constraint, ctx.qfrc_constraint),
      grad=sel(grad, ctx.grad), mgrad=sel(mgrad, ctx.mgrad),
      search=sel(search, ctx.search),
      prev_grad=sel(prev_grad, ctx.prev_grad),
      prev_mgrad=sel(prev_mgrad, ctx.prev_mgrad),
      cost=sel(cost, ctx.cost), prev_cost=sel(ctx.cost, ctx.prev_cost),
      solver_niter=jnp.where(ctx.done, ctx.solver_niter, niter),
      done=jnp.where(ctx.done, ctx.done, done))
  return new_ctx


def _fused_args(m: Model, d: Data):
  """Argument assembly for solver_kernels.newton_solve_batched, shared
  by the dispatch in solve() and the Mosaic compile probe so both see
  the identical kernel specialization."""
  import os as _os

  from . import io as io_mod
  from .types import IntegratorType
  nconmax = d.contact.dist.shape[-1]
  ne, nf, nl, stride, _ = io_mod.efc_layout(m, nconmax)
  use_ws = not (m.opt.disableflags & DisableBit.WARMSTART)
  euler_damp = (m.opt.integrator == IntegratorType.EULER and
                m.has_damping and
                not (m.opt.disableflags & DisableBit.EULERDAMP))
  hb = (m.opt.timestep * m.dof_damping) if euler_damp else None
  interp = (jax.default_backend() != 'tpu' and
            _os.environ.get('MJWT_FORCE_MEGA', '0') == '1')
  ell = None
  con_friction = con_dim = impratio = None
  if m.opt.cone == ConeType.ELLIPTIC and nconmax > 0 and stride >= 2:
    ell = (ne + nf + nl, stride, nconmax)
    con_friction = d.contact.friction
    con_dim = jnp.where(d.contact.geom[..., 0] >= 0,
                        d.contact.dim, 0).astype(d.qpos.dtype)
    impratio = m.opt.impratio
  from .pallas import solver_kernels as _sk
  args = (d.qM, d.efc_J, d.efc_D, d.efc_aref, d.efc_frictionloss,
          d.qfrc_smooth, d.qacc_warmstart, m.opt.tolerance,
          m.stat.meaninertia, hb, con_friction, con_dim, impratio)
  static = dict(ne=ne, nf=nf, iterations=m.opt.iterations, use_ws=use_ws,
                euler_damp=euler_damp, interpret=interp, ell=ell,
                hcover=_sk.hessian_cover(m))
  return args, static


def _probe_fused(m: Model, d: Data) -> bool:
  """AOT probe-compile the fused Newton kernel; False → XLA solver.
  Round-3 lesson generalized: EVERY default-ON Pallas dispatch needs a
  compile-failure fallback (the elliptic aloha_pot kernel dies in the
  Mosaic backend even though interpret mode accepts it)."""
  import functools as _ft

  from .pallas import probe, solver_kernels
  args, static = _fused_args(m, d)
  nj = d.efc_J.shape[-2]
  key = (f'fused_solve:{probe.model_sig(m)}:w{d.qpos.shape[0]}'
         f':nj{nj}:nc{d.contact.dist.shape[-1]}')
  shapes = probe.shapes_of(args)

  def build():
    fn = _ft.partial(solver_kernels.newton_solve_batched, **static)
    jax.jit(fn).lower(*shapes).compile()
  return probe.probe(key, build)


def uses_fused_kernel(m: Model, d: Data) -> bool:
  """True when the batched solve dispatches to the single-kernel Pallas
  Newton solver (pallas/solver_kernels). The kernel also computes
  qacc_smooth and the qM factor, so fwd_acceleration skips its solve.

  Gated on MJWT_FUSED_SOLVER (default on — TPU-validated: parity vs the
  XLA solver at rel<=2e-5 with identical iteration counts, and 44->33ms
  on the humanoid@8192 step; set 0 to fall back). On TPU the kernel is
  probe-compiled first: a Mosaic rejection logs a warning and falls back
  to the XLA solver instead of crashing the user's jit."""
  import os
  if os.environ.get('MJWT_FUSED_SOLVER', '1') == '0':
    return False
  njmax = d.efc_J.shape[-2]
  backend_ok = (jax.default_backend() == 'tpu' or
                os.environ.get('MJWT_FORCE_MEGA', '0') == '1')
  # both cones are in-kernel; the kernel's bracket+secant+Newton-polish
  # linesearch serves the ls_parallel=False case too (same converged
  # optimum — phi is convex; MJWT_FUSED_SOLVER=0 restores the XLA
  # solver which honors the iterative-LS flag exactly)
  ok = (backend_ok and d.qpos.ndim == 2 and
        m.opt.solver == SolverType.NEWTON and
        m.opt.cone in (ConeType.PYRAMIDAL, ConeType.ELLIPTIC) and
        0 < m.nv <= 32 and njmax > 0 and m.opt.iterations > 0 and
        not (m.opt.disableflags & DisableBit.CONSTRAINT))
  return ok and _probe_fused(m, d)


def _chunked_solve(m: Model, d: Data) -> Data | None:
  """Big-batch XLA solve, chunked: the single batch-wide
  ``lax.while_loop`` iterates until the SLOWEST of all W worlds
  converges — at 8192 worlds a handful of hard worlds make the whole
  batch pay max-iterations of full-size Hessian/Cholesky/linesearch
  work (three_humanoids r4: 422 ms/step). Instead: sort worlds by
  previous-step solver_niter (temporally coherent difficulty), split
  into MJWT_SOLVER_CHUNK-world chunks, and run each chunk's while_loop
  independently under ``lax.map`` — each chunk stops at its own
  max-iter, so total work ~= sum of chunk maxes ~= batch mean.
  Returns None when not applicable (small batch, single world,
  disabled via MJWT_SOLVER_CHUNK=0)."""
  import os as _os
  chunk = int(_os.environ.get('MJWT_SOLVER_CHUNK', '1024'))
  if chunk <= 0 or d.qpos.ndim != 2:
    return None
  W = d.qpos.shape[0]
  if W < 2 * chunk:
    return None
  nchunk = -(-W // chunk)
  wpad = nchunk * chunk
  perm = jnp.argsort(d.solver_niter)
  if wpad != W:  # pad with repeats of the easiest world; extras dropped
    perm = jnp.concatenate(
        [perm, jnp.broadcast_to(perm[:1], (wpad - W,))])
  idx = perm.reshape(nchunk, chunk)

  def one_chunk(ix):
    dd = jax.tree.map(
        lambda x: jnp.take(x, ix, axis=0)
        if (hasattr(x, 'ndim') and x.ndim >= 1 and x.shape[0] == W)
        else x, d)
    out = _solve_xla(m, dd)
    return (out.qacc, out.qfrc_constraint, out.efc_force,
            out.solver_niter)

  qacc, qfc, force, niter = jax.lax.map(one_chunk, idx)
  # sorted row j (j < W) is world perm[j]; pad rows are dropped
  inv = jnp.argsort(perm[:W])
  unchunk = lambda x: jnp.take(
      x.reshape((wpad,) + x.shape[2:])[:W], inv, axis=0)
  return d.replace(qacc=unchunk(qacc), qfrc_constraint=unchunk(qfc),
                   efc_force=unchunk(force),
                   solver_niter=unchunk(niter))


def solve(m: Model, d: Data) -> Data:
  """Entry point (reference solver.py:3296). Works single-world
  ((nj, nv) arrays) or batch-native ((W, nj, nv) arrays)."""
  dtype = d.qpos.dtype
  njmax = d.efc_J.shape[-2]
  batch_shape = d.qpos.shape[:-1]
  if (njmax == 0 or m.nv == 0 or m.opt.iterations == 0 or
      m.opt.disableflags & DisableBit.CONSTRAINT):
    return d.replace(qacc=d.qacc_smooth,
                     qfrc_constraint=jnp.zeros_like(d.qacc_smooth),
                     solver_niter=jnp.zeros(batch_shape, jnp.int32))

  if uses_fused_kernel(m, d):
    from .pallas import solver_kernels
    args, static = _fused_args(m, d)
    perm, inv_perm = solver_kernels.world_sort_perm(d.solver_niter)
    qacc, qfc, force, niter, qacc_smooth, qld, qacc_euler = (
        solver_kernels.newton_solve_batched(*args, perm, inv_perm,
                                            **static))
    return d.replace(qacc=qacc, qfrc_constraint=qfc, efc_force=force,
                     solver_niter=niter, qacc_smooth=qacc_smooth,
                     qLD=qld, qacc_euler=qacc_euler)

  d_chunked = _chunked_solve(m, d)
  if d_chunked is not None:
    return d_chunked
  return _solve_xla(m, d)


def _solve_xla(m: Model, d: Data) -> Data:
  """The XLA-level Newton/CG solve (one while_loop over the batch)."""
  dtype = d.qpos.dtype
  batch_shape = d.qpos.shape[:-1]
  if m.opt.disableflags & DisableBit.WARMSTART:
    qacc = d.qacc_smooth
  else:
    qacc = d.qacc_warmstart

  ma = _mul_qm(m, d, qacc)
  jaref = jnp.einsum('...jn,...n->...j', d.efc_J, qacc,
                     **_EINSUM) - d.efc_aref
  force, qfrc_constraint, cost_c, quad, cone_mid = _update_constraint(
      m, d, jaref)
  cost = cost_c + _gauss_cost(m, d, qacc, ma)
  grad, mgrad = _update_gradient(m, d, (ma, qfrc_constraint, quad),
                                 jaref=jaref, cone_middle=cone_mid)

  ctx = _Ctx(
      qacc=qacc, Ma=ma, jaref=jaref, force=force,
      qfrc_constraint=qfrc_constraint, grad=grad, mgrad=mgrad,
      search=-mgrad, prev_grad=grad, prev_mgrad=mgrad, cost=cost,
      prev_cost=jnp.full(batch_shape, jnp.inf, dtype),
      solver_niter=jnp.zeros(batch_shape, jnp.int32),
      done=jnp.zeros(batch_shape, bool))

  # immediate convergence check on the initial gradient
  gradient0 = _rescale(m, jnp.sqrt(jnp.sum(grad * grad, axis=-1)))
  ctx = dataclasses.replace(ctx, done=gradient0 < m.opt.tolerance)

  ctx = jax.lax.while_loop(
      lambda c: ~jnp.all(c.done),
      lambda c: _iteration(m, d, c),
      ctx)

  return d.replace(
      qacc=ctx.qacc, qfrc_constraint=ctx.qfrc_constraint,
      efc_force=ctx.force, solver_niter=ctx.solver_niter)


del Any
