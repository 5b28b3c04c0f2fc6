"""Passive forces: joint springs, dof dampers, gravity compensation
(reference: mujoco_warp/_src/passive.py; C mj_passive).

Fluid forces (inertia-box / ellipsoid models) are gated behind a static
flag and implemented in a follow-up pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math
from .types import Data, DisableBit, JointType, Model


def passive(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  nv = m.nv
  zero = jnp.zeros(nv, dtype)
  if m.opt.disableflags & DisableBit.PASSIVE or nv == 0:
    return d.replace(qfrc_spring=zero, qfrc_damper=zero,
                     qfrc_gravcomp=zero, qfrc_fluid=zero, qfrc_passive=zero)

  # joint springs (reference passive.py:71)
  qfrc_spring = zero
  for j in range(m.njnt):
    stiffness = m.jnt_stiffness[j]
    qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    jtype = m.jnt_type[j]
    if jtype == JointType.FREE:
      fs = -stiffness * (d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3])
      qfrc_spring = qfrc_spring.at[dadr:dadr + 3].add(fs)
      dif = math.quat_sub(d.qpos[qadr + 3:qadr + 7],
                          m.qpos_spring[qadr + 3:qadr + 7])
      qfrc_spring = qfrc_spring.at[dadr + 3:dadr + 6].add(-stiffness * dif)
    elif jtype == JointType.BALL:
      dif = math.quat_sub(d.qpos[qadr:qadr + 4],
                          m.qpos_spring[qadr:qadr + 4])
      qfrc_spring = qfrc_spring.at[dadr:dadr + 3].add(-stiffness * dif)
    else:
      qfrc_spring = qfrc_spring.at[dadr].add(
          -stiffness * (d.qpos[qadr] - m.qpos_spring[qadr]))

  qfrc_damper = -m.dof_damping * d.qvel

  # gravity compensation (reference passive.py:247): per-body counter-
  # gravity wrench mapped through the ancestor dof axes.
  qfrc_gravcomp = zero
  if m.ngravcomp and not (m.opt.disableflags & DisableBit.GRAVITY):
    force = -m.opt.gravity[None, :] * (
        m.body_mass * m.body_gravcomp)[:, None]
    # spatial force at body com about root subtree com
    offset = d.xipos - d.subtree_com[list(m.body_rootid), :]
    torque = jnp.cross(offset, force)
    cfrc = jnp.concatenate([torque, force], axis=1)  # (nbody, 6)
    csub = jnp.einsum('bc,ci->bi', m.body_subtree_mask, cfrc,
                      precision=jax.lax.Precision.HIGHEST)
    qfrc_gravcomp = jnp.einsum('ji,ji->j', d.cdof,
                               csub[list(m.dof_bodyid), :],
                               precision=jax.lax.Precision.HIGHEST)
    # joints flagged actuatorgravcomp route through qfrc_actuator instead
    keep = jnp.array([
        0.0 if m.jnt_actgravcomp[m.dof_jntid[i]] else 1.0
        for i in range(nv)], dtype)
    qfrc_gravcomp = qfrc_gravcomp * keep

  # tendon springs (with deadband range) and dampers
  # (reference passive.py:136-217)
  if m.ntendon:
    lo = m.tendon_lengthspring[:, 0]
    hi = m.tendon_lengthspring[:, 1]
    L = d.ten_length
    displacement = jnp.where(L > hi, hi - L, jnp.where(L < lo, lo - L, 0.0))
    frc_spring = m.tendon_stiffness * displacement
    frc_damper = -m.tendon_damping * d.ten_velocity
    qfrc_spring = qfrc_spring + jnp.einsum('tn,t->n', d.ten_J, frc_spring,
                                           precision=jax.lax.Precision.HIGHEST)
    qfrc_damper = qfrc_damper + jnp.einsum('tn,t->n', d.ten_J, frc_damper,
                                           precision=jax.lax.Precision.HIGHEST)

  qfrc_fluid = zero  # density/viscosity/wind: follow-up

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)
