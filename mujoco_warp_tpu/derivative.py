"""Analytic velocity derivatives for the implicitfast integrator
(reference: mujoco_warp/_src/derivative.py; C mjd_smooth_vel subset).

implicitfast uses qDeriv = d(qfrc_actuator + qfrc_passive_damping)/d(qvel),
deliberately omitting the RNE Coriolis derivative (that's what makes it
"fast" in MuJoCo too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import BiasType, Data, DisableBit, DynType, GainType, Model

_EINSUM = dict(precision=jax.lax.Precision.HIGHEST)


def deriv_smooth_vel(m: Model, d: Data) -> jax.Array:
  """(nv, nv) qDeriv = d qfrc_smooth / d qvel (velocity terms only)."""
  dtype = d.qpos.dtype
  qderiv = -jnp.diag(m.dof_damping)

  if m.ntendon:
    # tendon damping: d(-b_t * ten_J qvel)/dqvel = -b_t ten_J^T ten_J
    # (reference derivative.py tendon block; C mjd_passive_vel)
    qderiv = qderiv - jnp.einsum('tn,t,tk->nk', d.ten_J,
                                 m.tendon_damping, d.ten_J, **_EINSUM)

  if m.nu and not m.opt.disableflags & DisableBit.ACTUATION:
    # d force_u / d vel_u from affine gain/bias velocity coefficients
    coeffs = []
    for u in range(m.nu):
      gaintype, biastype = m.actuator_gaintype[u], m.actuator_biastype[u]
      c = jnp.zeros((), dtype)
      if biastype == BiasType.AFFINE:
        c = c + m.actuator_biasprm[u, 2]
      if gaintype == GainType.AFFINE:
        if m.actuator_dyntype[u] == DynType.NONE:
          inp = d.ctrl[u]
        else:
          aadr = m.actuator_actadr[u] + m.actuator_actnum[u] - 1
          inp = d.act[aadr]
        c = c + m.actuator_gainprm[u, 2] * inp
      coeffs.append(c)
    coeff = jnp.stack(coeffs)
    qderiv = qderiv + jnp.einsum('un,u,uk->nk', d.actuator_moment, coeff,
                                 d.actuator_moment, **_EINSUM)
  return qderiv
