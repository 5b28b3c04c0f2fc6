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

  # fluid forces, inertia-box model (reference passive.py:276-503;
  # C mj_inertiaBoxFluidModel), vectorized over bodies
  qfrc_fluid = zero
  if m.fluid_active:
    inertia = m.body_inertia                       # (nbody, 3)
    mass = jnp.maximum(m.body_mass, 1e-12)
    i0, i1, i2 = inertia[:, 0], inertia[:, 1], inertia[:, 2]
    box = jnp.stack([
        jnp.sqrt(jnp.maximum(1e-15, (i1 + i2 - i0) / mass * 6.0)),
        jnp.sqrt(jnp.maximum(1e-15, (i0 + i2 - i1) / mass * 6.0)),
        jnp.sqrt(jnp.maximum(1e-15, (i0 + i1 - i2) / mass * 6.0)),
    ], axis=1)                                      # (nbody, 3)
    # 6D body-com velocity in the inertial (ximat) frame
    offset = d.xipos - d.subtree_com[list(m.body_rootid), :]
    lvel = jax.vmap(math.transform_motion)(d.cvel, offset, d.ximat)
    ang = lvel[:, :3]
    lin = lvel[:, 3:] - jnp.einsum('bij,j->bi', d.ximat.transpose(0, 2, 1),
                                   m.opt.wind)
    lfrc_ang = jnp.zeros_like(ang)
    lfrc_lin = jnp.zeros_like(lin)
    # viscous resistance (equivalent-sphere, low Reynolds)
    diam = jnp.mean(box, axis=1, keepdims=True)
    pi = jnp.pi
    lfrc_ang = lfrc_ang - pi * diam ** 3 * m.opt.viscosity * ang
    lfrc_lin = lfrc_lin - 3.0 * pi * diam * m.opt.viscosity * lin
    # quadratic drag from the box faces
    b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
    area = jnp.stack([b1 * b2, b0 * b2, b0 * b1], axis=1)
    lfrc_lin = lfrc_lin - 0.5 * m.opt.density * area * jnp.abs(lin) * lin
    moment = jnp.stack([b0 * (b1 ** 4 + b2 ** 4),
                        b1 * (b0 ** 4 + b2 ** 4),
                        b2 * (b0 ** 4 + b1 ** 4)], axis=1)
    lfrc_ang = lfrc_ang - (m.opt.density * moment *
                           jnp.abs(ang) * ang / 64.0)
    # rotate to world, apply at body com -> com-frame wrench -> qfrc
    wfrc = jnp.einsum('bij,bj->bi', d.ximat, lfrc_lin)
    wtrq = jnp.einsum('bij,bj->bi', d.ximat, lfrc_ang)
    cfrc = jnp.concatenate([wtrq + jnp.cross(offset, wfrc), wfrc], axis=1)
    csub = jnp.einsum('bc,ci->bi', m.body_subtree_mask, cfrc,
                      precision=jax.lax.Precision.HIGHEST)
    qfrc_fluid = jnp.einsum('ji,ji->j', d.cdof,
                            csub[list(m.dof_bodyid), :],
                            precision=jax.lax.Precision.HIGHEST)

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)
