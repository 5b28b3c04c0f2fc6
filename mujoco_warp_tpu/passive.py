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
  dsbl_spring = bool(m.opt.disableflags & DisableBit.SPRING)
  dsbl_damper = bool(m.opt.disableflags & DisableBit.DAMPER)
  if (dsbl_spring and dsbl_damper) or nv == 0:
    # both spring+damper off zeroes the whole passive bucket
    # (reference passive.py:734-740)
    return d.replace(qfrc_spring=zero, qfrc_damper=zero,
                     qfrc_gravcomp=zero, qfrc_fluid=zero, qfrc_passive=zero)

  # joint springs (reference passive.py:71). Scalar (hinge/slide)
  # joints are batched into one gather/scatter — a flex model has
  # thousands of them and a per-joint unroll would explode the trace;
  # free/ball joints (quaternion difference) stay per-joint.
  import numpy as np
  qfrc_spring = zero
  scalar_j = [j for j in range(m.njnt)
              if m.jnt_type[j] in (JointType.HINGE, JointType.SLIDE)]
  if dsbl_spring:
    scalar_j = []
  if scalar_j:
    qadrs = np.array([m.jnt_qposadr[j] for j in scalar_j])
    dadrs = np.array([m.jnt_dofadr[j] for j in scalar_j])
    stiff = m.jnt_stiffness[np.array(scalar_j)]
    fs = -stiff * (d.qpos[qadrs] - m.qpos_spring[qadrs])
    qfrc_spring = qfrc_spring.at[dadrs].add(fs)
  for j in range(m.njnt if not dsbl_spring else 0):
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

  qfrc_damper = zero if dsbl_damper else -m.dof_damping * d.qvel

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
    if not dsbl_spring:
      qfrc_spring = qfrc_spring + jnp.einsum(
          'tn,t->n', d.ten_J, frc_spring, precision=jax.lax.Precision.HIGHEST)
    if not dsbl_damper:
      qfrc_damper = qfrc_damper + jnp.einsum(
          'tn,t->n', d.ten_J, frc_damper, precision=jax.lax.Precision.HIGHEST)

  # fluid forces, inertia-box model (reference passive.py:276-503;
  # C mj_inertiaBoxFluidModel), vectorized over bodies; bodies carrying
  # fluidshape="ellipsoid" geoms use the per-geom ellipsoid model below
  qfrc_fluid = zero
  ell_bodies = [b for b in range(m.nbody) if m.body_fluid_ellipsoid[b]]
  if m.fluid_active and ell_bodies:
    qfrc_fluid = qfrc_fluid + _fluid_ellipsoid(m, d)
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
    if ell_bodies:  # those bodies are handled by the ellipsoid model
      keep_box = jnp.asarray(
          [0.0 if m.body_fluid_ellipsoid[b] else 1.0
           for b in range(m.nbody)], dtype)[:, None]
      cfrc = cfrc * keep_box
    csub = jnp.einsum('bc,ci->bi', m.body_subtree_mask, cfrc,
                      precision=jax.lax.Precision.HIGHEST)
    qfrc_fluid = qfrc_fluid + jnp.einsum(
        'ji,ji->j', d.cdof, csub[list(m.dof_bodyid), :],
        precision=jax.lax.Precision.HIGHEST)

  # flex elasticity + bending + damping (reference passive.py:567-746)
  if m.flex_meta.nflex:
    from . import flex as flex_mod
    qfrc_spring = qfrc_spring + flex_mod.passive_force(m, d)

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid
  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_gravcomp=qfrc_gravcomp, qfrc_fluid=qfrc_fluid,
                   qfrc_passive=qfrc_passive)


_GEOM_SPHERE, _GEOM_CAPSULE, _GEOM_CYLINDER = 2, 3, 5
_MINVAL = 1e-15


def _fluid_ellipsoid(m: Model, d: Data) -> jax.Array:
  """Per-geom ellipsoid fluid model (reference passive.py:276-455;
  C mj_ellipsoidFluidModel): added mass, Magnus lift, Kutta lift,
  blunt/slender/angular drag — vectorized over the static list of fluid
  geoms, each wrench applied at geom_xpos (C mj_applyFT semantics)."""
  import numpy as np
  dtype = d.qpos.dtype
  # all geoms of ellipsoid-flagged bodies; geoms with coef == 0
  # contribute exactly zero (every term scales with coef), so no
  # per-geom coefficient check is needed at trace time
  gids = [g for g in range(m.ngeom)
          if m.body_fluid_ellipsoid[m.geom_bodyid[g]]]
  if not gids:
    return jnp.zeros(m.nv, dtype)
  gids_np = np.asarray(gids)
  bids = np.asarray([m.geom_bodyid[g] for g in gids])
  gtypes = np.asarray([m.geom_type[g] for g in gids])

  size = m.geom_size[gids_np]                        # (G, 3)
  r, half = size[:, 0], size[:, 1]
  is_sph = jnp.asarray(gtypes == _GEOM_SPHERE)[:, None]
  is_cap = jnp.asarray(gtypes == _GEOM_CAPSULE)[:, None]
  is_cyl = jnp.asarray(gtypes == _GEOM_CYLINDER)[:, None]
  rrh = jnp.stack([r, r, half], axis=1)
  semi = jnp.where(is_sph, r[:, None],
                   jnp.where(is_cap, rrh + jnp.stack(
                       [jnp.zeros_like(r), jnp.zeros_like(r), r], axis=1),
                             jnp.where(is_cyl, rrh, size)))

  fl = m.geom_fluid[gids_np]                         # (G, 12)
  coef = fl[:, 0]
  blunt_drag, slender_drag, ang_drag = fl[:, 1], fl[:, 2], fl[:, 3]
  kutta_coef, magnus_coef = fl[:, 4], fl[:, 5]
  vmass, vinert = fl[:, 6:9], fl[:, 9:12]

  density, viscosity = m.opt.density, m.opt.viscosity

  # geom-local 6D velocity
  xipos_b = d.xipos[bids]
  root_com = d.subtree_com[np.asarray(m.body_rootid)[bids]]
  ang_g = d.cvel[bids, :3]
  lin_com = d.cvel[bids, 3:] - jnp.cross(xipos_b - root_com, ang_g)
  gpos = d.geom_xpos[gids_np]
  gmat = d.geom_xmat[gids_np]                        # (G, 3, 3)
  lin_point = lin_com + jnp.cross(ang_g, gpos - xipos_b)
  rt = gmat.transpose(0, 2, 1)
  l_ang = jnp.einsum('gij,gj->gi', rt, ang_g)
  l_lin = jnp.einsum('gij,gj->gi', rt, lin_point - m.opt.wind[None, :])

  lfrc_force = jnp.zeros_like(l_lin)
  lfrc_torque = jnp.zeros_like(l_ang)

  # added-mass forces/torques (virtual momentum cross products)
  vlm = density * vmass * l_lin
  vam = density * vinert * l_ang
  lfrc_force = lfrc_force + jnp.cross(vlm, l_ang)
  lfrc_torque = lfrc_torque + jnp.cross(vlm, l_lin) + jnp.cross(vam, l_ang)

  s0, s1, s2 = semi[:, 0], semi[:, 1], semi[:, 2]
  volume = (4.0 / 3.0) * jnp.pi * s0 * s1 * s2
  d_max = jnp.max(semi, axis=1)
  d_min = jnp.min(semi, axis=1)
  d_mid = s0 + s1 + s2 - d_max - d_min
  a_max = jnp.pi * d_max * d_mid
  lin_speed = math.norm(l_lin)

  magnus = jnp.cross(l_ang, l_lin) * (
      magnus_coef * density * volume)[:, None]

  s12, s20, s01 = s1 * s2, s2 * s0, s0 * s1
  proj_denom = (s12 ** 4 * l_lin[:, 0] ** 2 + s20 ** 4 * l_lin[:, 1] ** 2 +
                s01 ** 4 * l_lin[:, 2] ** 2)
  proj_num = ((s12 * l_lin[:, 0]) ** 2 + (s20 * l_lin[:, 1]) ** 2 +
              (s01 * l_lin[:, 2]) ** 2)
  ok = (proj_num > _MINVAL) & (proj_denom > _MINVAL)
  a_proj = jnp.where(ok, jnp.pi * jnp.sqrt(
      proj_denom / jnp.maximum(proj_num, _MINVAL)), 0.0)
  cos_alpha = jnp.where(
      ok & (lin_speed > _MINVAL),
      proj_num / jnp.maximum(lin_speed * proj_denom, _MINVAL), 0.0)
  norm_v = jnp.stack([s12 ** 2 * l_lin[:, 0], s20 ** 2 * l_lin[:, 1],
                      s01 ** 2 * l_lin[:, 2]], axis=1)
  kutta_circ = jnp.cross(norm_v, l_lin) * (
      kutta_coef * density * cos_alpha * a_proj)[:, None]
  kutta = jnp.where((lin_speed > _MINVAL)[:, None],
                    jnp.cross(kutta_circ, l_lin), 0.0)

  eq_d = (2.0 / 3.0) * (s0 + s1 + s2)
  lin_visc_force = 3.0 * jnp.pi * eq_d
  lin_visc_torq = jnp.pi * eq_d ** 3
  i_max = (8.0 / 15.0) * jnp.pi * d_mid * d_max ** 4

  def max_moment(k):
    dd0 = semi[:, k]
    dd1 = semi[:, (k + 1) % 3]
    dd2 = semi[:, (k + 2) % 3]
    return (8.0 / 15.0) * jnp.pi * dd0 * jnp.maximum(dd1, dd2) ** 4

  ii = jnp.stack([max_moment(k) for k in range(3)], axis=1)
  mom_visc = l_ang * (ang_drag[:, None] * ii +
                      slender_drag[:, None] * (i_max[:, None] - ii))
  drag_lin = viscosity * lin_visc_force + density * lin_speed * (
      a_proj * blunt_drag + slender_drag * (a_max - a_proj))
  drag_ang = viscosity * lin_visc_torq + density * math.norm(mom_visc)

  lfrc_torque = (lfrc_torque - drag_ang[:, None] * l_ang) * coef[:, None]
  lfrc_force = (lfrc_force + magnus + kutta -
                drag_lin[:, None] * l_lin) * coef[:, None]

  wfrc = jnp.einsum('gij,gj->gi', gmat, lfrc_force)
  wtrq = jnp.einsum('gij,gj->gi', gmat, lfrc_torque)
  # wrench at geom_xpos -> com-frame wrench -> project on ancestor dofs
  lever = gpos - root_com
  cfrc = jnp.concatenate([wtrq + jnp.cross(lever, wfrc), wfrc], axis=1)
  qfrc = jnp.einsum('gn,gi,ni->n', m.body_dof_ancestor_mask[bids], cfrc,
                    d.cdof, precision=jax.lax.Precision.HIGHEST)
  return qfrc
