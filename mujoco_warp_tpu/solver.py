"""Constraint solver: projected Newton and CG on the primal qacc problem
(reference: mujoco_warp/_src/solver.py; C mj_solPrimal).

TPU-native structure: the whole solve is one ``lax.while_loop`` whose
carried state is a small pytree; per-world convergence uses a ``done``
flag folded into every update (under vmap the loop condition becomes an
implicit any-reduce) — the XLA equivalent of the reference's conditional
CUDA graph ``wp.capture_while`` + per-world early-outs
(solver.py:3327-3343, 3151-3254).

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
from . import smooth
from .types import ConstraintType, Data, DisableBit, Model, SolverType

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


def _rescale(m: Model, value):
  return value / (jnp.maximum(m.stat.meaninertia, _MINVAL) *
                  jnp.maximum(1, m.nv))


def _row_masks(m: Model, d: Data):
  """Static-ish per-row classification masks."""
  is_eq = d.efc_type == ConstraintType.EQUALITY
  is_fr = (d.efc_type == ConstraintType.FRICTION_DOF) | (
      d.efc_type == ConstraintType.FRICTION_TENDON)
  is_oneside = ~is_eq & ~is_fr
  return is_eq, is_fr, is_oneside


def _update_constraint(m: Model, d: Data, jaref):
  """Per-row force, cost, active state (reference solver.py:1805-1953)."""
  is_eq, is_fr, is_one = _row_masks(m, d)
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
  cost = jnp.sum(cost_rows)

  qfrc_constraint = jnp.einsum('jn,j->n', d.efc_J, force, **_EINSUM)
  return force, qfrc_constraint, cost, quad


def _gauss_cost(m: Model, d: Data, qacc, ma):
  return 0.5 * jnp.dot(ma - d.qfrc_smooth, qacc - d.qacc_smooth)


def _update_gradient(m: Model, d: Data, ctx_grad_inputs):
  """grad, and Mgrad via Newton Hessian or CG preconditioner."""
  ma, qfrc_constraint, quad = ctx_grad_inputs
  grad = ma - d.qfrc_smooth - qfrc_constraint
  if m.opt.solver == SolverType.NEWTON:
    dh = d.efc_D * quad.astype(d.efc_D.dtype)
    # H = M + J^T diag(Dh) J — the hot kernel (reference solver.py:2368)
    jd = d.efc_J * dh[:, None]
    h = d.qM + jnp.einsum('jn,jk->nk', jd, d.efc_J, **_EINSUM)
    mgrad = linalg.spd_solve(h, grad)
  else:
    mgrad = smooth.solve_m(m, d, grad)
  return grad, mgrad


def _linesearch(m: Model, d: Data, ctx: _Ctx):
  """Exact convex piecewise-quadratic linesearch along ctx.search."""
  p = ctx.search
  mv = jnp.einsum('ij,j->i', d.qM, p, **_EINSUM)
  jv = jnp.einsum('jn,n->j', d.efc_J, p, **_EINSUM)

  # gauss quadratic: phi_g'(a) = g0 + a h0
  g0 = jnp.dot(p, ctx.Ma - d.qfrc_smooth)
  h0 = jnp.dot(p, mv)

  is_eq, is_fr, is_one = _row_masks(m, d)
  D = d.efc_D
  fl = d.efc_frictionloss
  rf = fl / jnp.maximum(D, _MINVAL)
  jaref = ctx.jaref

  def phi_d(alpha):
    """(phi'(alpha), phi''(alpha)) — both scalar."""
    x = jaref + alpha * jv
    lin_neg = is_fr & (x <= -rf)
    lin_pos = is_fr & (x >= rf)
    quad = is_eq | (is_fr & ~lin_neg & ~lin_pos) | (is_one & (x < 0.0))
    d1_rows = jnp.where(quad, D * x * jv, 0.0)
    d1_rows = d1_rows + jnp.where(lin_neg, -fl * jv, 0.0)
    d1_rows = d1_rows + jnp.where(lin_pos, fl * jv, 0.0)
    d2_rows = jnp.where(quad, D * jv * jv, 0.0)
    return (g0 + alpha * h0 + jnp.sum(d1_rows),
            h0 + jnp.sum(d2_rows))

  p1_0, p2_0 = phi_d(jnp.zeros((), p.dtype))
  alpha0 = -p1_0 / jnp.maximum(p2_0, _MINVAL)
  alpha0 = jnp.maximum(alpha0, 0.0)

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

  zero = jnp.zeros((), p.dtype)
  state = (alpha0, zero, alpha0, jnp.zeros((), bool), p1_0 >= 0)
  alpha, *_ = jax.lax.fori_loop(0, m.opt.ls_iterations, body, state)
  alpha = jnp.where(p1_0 >= 0, 0.0, alpha)
  return alpha, mv, jv


def _iteration(m: Model, d: Data, ctx: _Ctx) -> _Ctx:
  alpha, mv, jv = _linesearch(m, d, ctx)
  qacc = ctx.qacc + alpha * ctx.search
  ma = ctx.Ma + alpha * mv
  jaref = ctx.jaref + alpha * jv

  force, qfrc_constraint, cost_c, quad = _update_constraint(m, d, jaref)
  cost = cost_c + _gauss_cost(m, d, qacc, ma)
  grad, mgrad = _update_gradient(m, d, (ma, qfrc_constraint, quad))

  if m.opt.solver == SolverType.CG:
    beta_num = jnp.dot(grad, mgrad - ctx.prev_mgrad)
    beta_den = jnp.maximum(jnp.dot(ctx.prev_grad, ctx.prev_mgrad), _MINVAL)
    beta = jnp.maximum(0.0, beta_num / beta_den)
    search = -mgrad + beta * ctx.search
  else:
    search = -mgrad

  improvement = _rescale(m, ctx.cost - cost)
  gradient = _rescale(m, jnp.sqrt(jnp.sum(grad * grad)))
  niter = ctx.solver_niter + 1
  done = ctx.done | (improvement < m.opt.tolerance) | (
      gradient < m.opt.tolerance) | (niter >= m.opt.iterations)

  # masked commit: converged worlds keep their state (vmap-safe)
  def sel(new, old):
    expand = (Ellipsis,) + (None,) * (new.ndim - ctx.done.ndim)
    return jnp.where(ctx.done[expand] if new.ndim else ctx.done, old, new)

  new_ctx = _Ctx(
      qacc=sel(qacc, ctx.qacc), Ma=sel(ma, ctx.Ma),
      jaref=sel(jaref, ctx.jaref), force=sel(force, ctx.force),
      qfrc_constraint=sel(qfrc_constraint, ctx.qfrc_constraint),
      grad=sel(grad, ctx.grad), mgrad=sel(mgrad, ctx.mgrad),
      search=sel(search, ctx.search),
      prev_grad=sel(grad, ctx.prev_grad),
      prev_mgrad=sel(mgrad, ctx.prev_mgrad),
      cost=sel(cost, ctx.cost), prev_cost=sel(ctx.cost, ctx.prev_cost),
      solver_niter=jnp.where(ctx.done, ctx.solver_niter, niter),
      done=jnp.where(ctx.done, ctx.done, done))
  return new_ctx


def solve(m: Model, d: Data) -> Data:
  """Entry point (reference solver.py:3296)."""
  dtype = d.qpos.dtype
  njmax = d.efc_J.shape[0]
  if (njmax == 0 or m.nv == 0 or m.opt.iterations == 0 or
      m.opt.disableflags & DisableBit.CONSTRAINT):
    return d.replace(qacc=d.qacc_smooth,
                     qfrc_constraint=jnp.zeros(m.nv, dtype),
                     solver_niter=jnp.zeros((), jnp.int32))

  if m.opt.disableflags & DisableBit.WARMSTART:
    qacc = d.qacc_smooth
  else:
    qacc = d.qacc_warmstart

  ma = jnp.einsum('ij,j->i', d.qM, qacc, **_EINSUM)
  jaref = jnp.einsum('jn,n->j', d.efc_J, qacc, **_EINSUM) - d.efc_aref
  force, qfrc_constraint, cost_c, quad = _update_constraint(m, d, jaref)
  cost = cost_c + _gauss_cost(m, d, qacc, ma)
  grad, mgrad = _update_gradient(m, d, (ma, qfrc_constraint, quad))

  ctx = _Ctx(
      qacc=qacc, Ma=ma, jaref=jaref, force=force,
      qfrc_constraint=qfrc_constraint, grad=grad, mgrad=mgrad,
      search=-mgrad, prev_grad=grad, prev_mgrad=mgrad, cost=cost,
      prev_cost=jnp.full((), jnp.inf, dtype),
      solver_niter=jnp.zeros((), jnp.int32),
      done=jnp.zeros((), bool))

  # immediate convergence check on the initial gradient
  gradient0 = _rescale(m, jnp.sqrt(jnp.sum(grad * grad)))
  ctx = dataclasses.replace(ctx, done=gradient0 < m.opt.tolerance)

  ctx = jax.lax.while_loop(
      lambda c: ~jnp.all(c.done),
      lambda c: _iteration(m, d, c),
      ctx)

  return d.replace(
      qacc=ctx.qacc, qfrc_constraint=ctx.qfrc_constraint,
      efc_force=ctx.force, solver_niter=ctx.solver_niter)


del Any
