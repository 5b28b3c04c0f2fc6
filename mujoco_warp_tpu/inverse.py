"""Inverse dynamics (reference: mujoco_warp/_src/inverse.py; C
mj_inverse): given (qpos, qvel, qacc), recover the generalized force
that must have been applied.

qfrc_inverse = M qacc + qfrc_bias - qfrc_passive - qfrc_constraint

Constraint forces need no iteration in inverse mode: with qacc known,
each row's force follows directly from its impedance zone
(solver._update_constraint). INVDISCRETE converts discrete-time qacc to
continuous before inverting (reference inverse.py:70 discrete_acc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import collision_driver
from . import constraint
from . import derivative
from . import linalg
from . import sensor as sensor_mod
from . import smooth
from . import solver as solver_mod
from . import support
from .forward import fwd_position, fwd_velocity
from .types import Data, DisableBit, EnableBit, IntegratorType, Model

_EINSUM = dict(precision=jax.lax.Precision.HIGHEST)


def discrete_acc(m: Model, d: Data) -> jax.Array:
  """Convert discrete-time qacc to continuous-time qacc
  (reference inverse.py:70; C mj_discreteAcc)."""
  qacc = d.qacc
  if m.opt.integrator == IntegratorType.RK4:
    raise NotImplementedError('INVDISCRETE with RK4')
  if m.opt.integrator == IntegratorType.EULER:
    if not m.has_damping or (m.opt.disableflags & DisableBit.EULERDAMP):
      return qacc
    # forward used (M + h diag(B)); undo: qfrc = (M + hB) qacc,
    # qacc_cont = M^-1 qfrc
    mh_qacc = support.mul_m(m, d, qacc) + (
        m.opt.timestep * m.dof_damping * qacc)
    return smooth.solve_m(m, d, mh_qacc)
  # implicitfast: qfrc = (M - h qDeriv) qacc
  qderiv = derivative.deriv_smooth_vel(m, d)
  mh = d.qM - m.opt.timestep * qderiv
  mh = 0.5 * (mh + mh.T)
  qfrc = jnp.einsum('ij,j->i', mh, qacc, **_EINSUM)
  return smooth.solve_m(m, d, qfrc)


def inv_constraint(m: Model, d: Data) -> Data:
  """Constraint force from known qacc (reference inverse.py:116)."""
  njmax = d.efc_J.shape[-2]
  if njmax == 0 or m.opt.disableflags & DisableBit.CONSTRAINT:
    return d.replace(qfrc_constraint=jnp.zeros(m.nv, d.qpos.dtype))
  jaref = jnp.einsum('...jn,...n->...j', d.efc_J, d.qacc,
                     **_EINSUM) - d.efc_aref
  force, qfrc_constraint, _, _, _ = solver_mod._update_constraint(
      m, d, jaref)
  return d.replace(efc_force=force, qfrc_constraint=qfrc_constraint)


def inverse(m: Model, d: Data) -> Data:
  """Full inverse dynamics (reference inverse.py:127)."""
  d = fwd_position(m, d)
  d = sensor_mod.sensor_pos(m, d)
  d = fwd_velocity(m, d)
  d = sensor_mod.sensor_vel(m, d)

  qacc = d.qacc
  if m.opt.enableflags & EnableBit.INVDISCRETE:
    d = d.replace(qacc=discrete_acc(m, d))

  d = inv_constraint(m, d)
  ma = support.mul_m(m, d, d.qacc)
  qfrc_inverse = (ma + d.qfrc_bias - d.qfrc_passive - d.qfrc_constraint)
  d = sensor_mod.sensor_acc(m, d)
  return d.replace(qfrc_inverse=qfrc_inverse, qacc=qacc)
