"""Constraint (efc) row assembly: equality, dof friction, joint limits,
contacts (reference: mujoco_warp/_src/constraint.py).

Static row layout (io.efc_layout): every potential row has a fixed
address; rows that don't exist this step get D = 0 (harmless in the
solver: force, cost and Hessian all scale with D). This replaces the
reference's per-world atomic row allocation (constraint.py:2209) — XLA
needs static shapes, and masked fixed rows cost less than the divergent
compaction they'd replace.

Row order matches MuJoCo: equality, friction, limit, contact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import io as io_mod
from . import math
from . import support
from .types import (ConeType, ConstraintType, Data, DisableBit, EqType,
                    JointType, Model)

_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999
_EINSUM = dict(precision=jax.lax.Precision.HIGHEST)


def _kbi(m: Model, solref, solimp, pos_imp):
  """Stiffness/damping/impedance from solver parameters
  (reference constraint.py:_efc_row; mj_assignRef/mj_getImpedance)."""
  timeconst, dampratio = solref[0], solref[1]
  dmin = jnp.clip(solimp[0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[1], _MINIMP, _MAXIMP)
  width = jnp.maximum(solimp[2], _MINVAL)
  mid = jnp.clip(solimp[3], _MINIMP, _MAXIMP)
  power = jnp.maximum(solimp[4], 1.0)

  if not m.opt.disableflags & DisableBit.REFSAFE:
    timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep)

  dmax_sq = dmax * dmax
  k = 1.0 / jnp.maximum(dmax_sq * timeconst * timeconst * dampratio *
                        dampratio, _MINVAL)
  b = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k = jnp.where(solref[0] <= 0, -solref[0] / dmax_sq, k)
  b = jnp.where(solref[1] <= 0, -solref[1] / dmax, b)

  imp_x = jnp.abs(pos_imp) / width
  imp_a = (1.0 / mid ** (power - 1)) * imp_x ** power
  imp_b = 1.0 - (1.0 / (1.0 - mid) ** (power - 1)) * (1.0 - imp_x) ** power
  imp_y = jnp.where(imp_x < mid, imp_a, imp_b)
  imp = dmin + imp_y * (dmax - dmin)
  imp = jnp.clip(imp, dmin, dmax)
  imp = jnp.where(imp_x > 1.0, dmax, imp)
  return k, b, imp


def _row(m: Model, J, pos_aref, pos_imp, invweight, solref, solimp, margin,
         vel, frictionloss, ctype, cid, active):
  """Finish one efc row; inactive rows get D = 0."""
  k, b, imp = _kbi(m, solref, solimp, pos_imp)
  d_val = 1.0 / jnp.maximum(invweight * (1.0 - imp) / imp, _MINVAL)
  aref = -k * imp * pos_aref - b * vel
  act = jnp.asarray(active, jnp.float32)
  return dict(
      J=J, pos=pos_aref + margin, margin=margin, D=d_val * act,
      vel=vel, aref=aref * act, frictionloss=frictionloss * act,
      type=jnp.full((), ctype, jnp.int32), id=jnp.full((), cid, jnp.int32),
      active=jnp.asarray(active, bool))


def _stack(rows, nv, dtype):
  out = {}
  for key in ('J', 'pos', 'margin', 'D', 'vel', 'aref', 'frictionloss',
              'type', 'id', 'active'):
    out[key] = jnp.stack([r[key] for r in rows])
  return out


def make_constraint(m: Model, d: Data) -> Data:
  """Assemble all efc rows (reference constraint.py:2209)."""
  nv = m.nv
  dtype = d.qpos.dtype
  nconmax = d.contact.dist.shape[0]
  ne, nf, nl, stride, njmax = io_mod.efc_layout(m, nconmax)
  if njmax == 0 or m.opt.disableflags & DisableBit.CONSTRAINT:
    return d.replace(ne=jnp.zeros((), jnp.int32),
                     nf=jnp.zeros((), jnp.int32),
                     nl=jnp.zeros((), jnp.int32),
                     nefc=jnp.zeros((), jnp.int32))

  rows = []
  eq_disabled = bool(m.opt.disableflags & DisableBit.EQUALITY)

  # --- equality ------------------------------------------------------------
  body_rootid = np.asarray(m.body_rootid)
  for i in range(m.neq):
    etype = m.eq_type[i]
    active = d.eq_active[i] & (not eq_disabled)
    data = m.eq_data[i]
    solref, solimp = m.eq_solref[i], m.eq_solimp[i]
    if etype == EqType.CONNECT:
      b1, b2 = m.eq_obj1id[i], m.eq_obj2id[i]
      anchor1, anchor2 = data[0:3], data[3:6]
      pos1 = d.xpos[b1] + d.xmat[b1] @ anchor1
      pos2 = d.xpos[b2] + d.xmat[b2] @ anchor2
      cpos = pos1 - pos2
      jacp1, _ = support.jac(m, d, pos1, b1)
      jacp2, _ = support.jac(m, d, pos2, b2)
      jdif = jacp1 - jacp2  # (3, nv)
      invweight = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
      pos_imp = math.norm(cpos)
      vel = jdif @ d.qvel
      for r in range(3):
        rows.append(_row(m, jdif[r], cpos[r], pos_imp, invweight, solref,
                         solimp, 0.0, vel[r], 0.0,
                         ConstraintType.EQUALITY, i, active))
    elif etype == EqType.WELD:
      b1, b2 = m.eq_obj1id[i], m.eq_obj2id[i]
      anchor1, anchor2 = data[0:3], data[3:6]
      relpose, torquescale = data[6:10], data[10]
      pos1 = d.xpos[b1] + d.xmat[b1] @ anchor2
      pos2 = d.xpos[b2] + d.xmat[b2] @ anchor1
      quat = math.mul_quat(d.xquat[b1], relpose)
      quat1 = math.quat_inv(d.xquat[b2])
      cpos = pos1 - pos2
      crotq = math.mul_quat(quat1, quat)
      crot = crotq[1:] * torquescale
      jacp1, jacr1 = support.jac(m, d, pos1, b1)
      jacp2, jacr2 = support.jac(m, d, pos2, b2)
      jdifp = jacp1 - jacp2
      jacdifr = (jacr1 - jacr2) * torquescale  # (3, nv)

      def rotj(col):
        q = math.mul_quat(math.mul_quat(
            quat1, jnp.concatenate([jnp.zeros(1, dtype), col])), quat)
        return 0.5 * q[1:]
      jdifr = jax.vmap(rotj, in_axes=1, out_axes=1)(jacdifr)
      invweight_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
      invweight_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
      pos_imp = jnp.sqrt(jnp.sum(cpos * cpos) + jnp.sum(crot * crot))
      velp = jdifp @ d.qvel
      velr = jdifr @ d.qvel
      for r in range(3):
        rows.append(_row(m, jdifp[r], cpos[r], pos_imp, invweight_t,
                         solref, solimp, 0.0, velp[r], 0.0,
                         ConstraintType.EQUALITY, i, active))
      for r in range(3):
        rows.append(_row(m, jdifr[r], crot[r], pos_imp, invweight_r,
                         solref, solimp, 0.0, velr[r], 0.0,
                         ConstraintType.EQUALITY, i, active))
    elif etype == EqType.JOINT:
      j1, j2 = m.eq_obj1id[i], m.eq_obj2id[i]
      d1, q1 = m.jnt_dofadr[j1], m.jnt_qposadr[j1]
      J = jnp.zeros(nv, dtype).at[d1].set(1.0)
      if j2 > -1:
        d2, q2 = m.jnt_dofadr[j2], m.jnt_qposadr[j2]
        dif = d.qpos[q2] - m.qpos0[q2]
        rhs = data[0] + dif * (data[1] + dif * (
            data[2] + dif * (data[3] + dif * data[4])))
        deriv = data[1] + dif * (2 * data[2] + dif * (
            3 * data[3] + dif * 4 * data[4]))
        pos = d.qpos[q1] - m.qpos0[q1] - rhs
        J = J.at[d2].set(-deriv)
        vel = d.qvel[d1] - deriv * d.qvel[d2]
        invweight = m.dof_invweight0[d1] + m.dof_invweight0[d2]
      else:
        pos = d.qpos[q1] - m.qpos0[q1] - data[0]
        vel = d.qvel[d1]
        invweight = m.dof_invweight0[d1]
      rows.append(_row(m, J, pos, pos, invweight, solref, solimp, 0.0,
                       vel, 0.0, ConstraintType.EQUALITY, i, active))
    else:
      raise NotImplementedError(f'equality type {etype}')
  assert sum(1 for _ in rows) == ne

  # --- dof friction ---------------------------------------------------------
  fr_disabled = bool(m.opt.disableflags & DisableBit.FRICTIONLOSS)
  for dofid in range(nv):
    if not m.dof_hasfrictionloss[dofid]:
      continue
    J = jnp.zeros(nv, dtype).at[dofid].set(1.0)
    rows.append(_row(m, J, 0.0, 0.0, m.dof_invweight0[dofid],
                     m.dof_solref[dofid], m.dof_solimp[dofid], 0.0,
                     d.qvel[dofid], m.dof_frictionloss[dofid],
                     ConstraintType.FRICTION_DOF, dofid, not fr_disabled))

  # --- joint limits ----------------------------------------------------------
  lim_disabled = bool(m.opt.disableflags & DisableBit.LIMIT)
  for j in range(m.njnt):
    if not m.jnt_limited[j]:
      continue
    jtype = m.jnt_type[j]
    qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    jrange, jmargin = m.jnt_range[j], m.jnt_margin[j]
    if jtype in (JointType.SLIDE, JointType.HINGE):
      dist_min = d.qpos[qadr] - jrange[0]
      dist_max = jrange[1] - d.qpos[qadr]
      pos = jnp.minimum(dist_min, dist_max) - jmargin
      active = (pos < 0) & (not lim_disabled)
      sign = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
      J = jnp.zeros(nv, dtype).at[dadr].set(sign)
      rows.append(_row(m, J, pos, pos, m.dof_invweight0[dadr],
                       m.jnt_solref[j], m.jnt_solimp[j], jmargin,
                       sign * d.qvel[dadr], 0.0,
                       ConstraintType.LIMIT_JOINT, j, active))
    elif jtype == JointType.BALL:
      quat = math.quat_normalize(d.qpos[qadr:qadr + 4])
      axis_angle = math.quat_to_vel(quat)
      axis, angle = math.normalize_with_norm(axis_angle)
      pos = jnp.maximum(jrange[0], jrange[1]) - angle - jmargin
      active = (pos < 0) & (not lim_disabled)
      J = jnp.zeros(nv, dtype).at[dadr:dadr + 3].set(-axis)
      vel = -axis @ d.qvel[dadr:dadr + 3]
      rows.append(_row(m, J, pos, pos, m.dof_invweight0[dadr],
                       m.jnt_solref[j], m.jnt_solimp[j], jmargin, vel, 0.0,
                       ConstraintType.LIMIT_JOINT, j, active))
    else:
      raise NotImplementedError(f'limit on joint type {jtype}')

  static = _stack(rows, nv, dtype) if rows else None

  # --- contacts (vmapped over the pool) --------------------------------------
  if nconmax and stride:
    con_rows = jax.vmap(lambda i: _contact_rows(m, d, i, stride))(
        jnp.arange(nconmax))
    # (nconmax, stride, ...) -> (nconmax*stride, ...)
    con_rows = jax.tree_util.tree_map(
        lambda x: x.reshape((nconmax * stride,) + x.shape[2:]), con_rows)
  else:
    con_rows = None

  def cat(key):
    parts = []
    if static is not None:
      parts.append(static[key])
    if con_rows is not None:
      parts.append(con_rows[key])
    return jnp.concatenate(parts, axis=0)

  efc_active = cat('active')
  efc_D = cat('D')
  ne_count = jnp.sum(efc_active[:ne].astype(jnp.int32)) if ne else (
      jnp.zeros((), jnp.int32))
  nf_count = jnp.sum(efc_active[ne:ne + nf].astype(jnp.int32)) if nf else (
      jnp.zeros((), jnp.int32))
  nl_count = jnp.sum(
      efc_active[ne + nf:ne + nf + nl].astype(jnp.int32)) if nl else (
          jnp.zeros((), jnp.int32))
  return d.replace(
      efc_J=cat('J'), efc_pos=cat('pos'), efc_margin=cat('margin'),
      efc_D=efc_D, efc_vel=cat('vel'), efc_aref=cat('aref'),
      efc_frictionloss=cat('frictionloss'), efc_type=cat('type'),
      efc_id=cat('id'), efc_active=efc_active,
      ne=ne_count, nf=nf_count, nl=nl_count,
      nefc=jnp.sum(efc_active.astype(jnp.int32)))


def _contact_rows(m: Model, d: Data, i, stride: int):
  """efc rows for contact slot i (traced); vmapped over the pool
  (reference constraint.py:1669 _contact_pyramidal)."""
  nv = m.nv
  dtype = d.qpos.dtype
  con = d.contact
  geom_bodyid = jnp.asarray(m.geom_bodyid)
  g1 = con.geom[i, 0]
  g2 = con.geom[i, 1]
  valid = g1 >= 0
  b1 = jnp.where(valid, geom_bodyid[g1], 0)
  b2 = jnp.where(valid, geom_bodyid[g2], 0)
  dim = con.dim[i]
  dist = con.dist[i]
  includemargin = con.includemargin[i]
  pos = dist - includemargin
  active_con = (pos < 0) & valid

  frame = con.frame[i]
  cpos = con.pos[i]
  jacp1, jacr1 = support.jac_dyn(m, d, cpos, b1)
  jacp2, jacr2 = support.jac_dyn(m, d, cpos, b2)
  jacp = jacp2 - jacp1  # (3, nv)
  jacr = jacr2 - jacr1
  jn = frame[0] @ jacp  # (nv,)
  # friction direction rows: tangents (jacp), torsion+rolling (jacr)
  jdirs = jnp.stack([frame[1] @ jacp, frame[2] @ jacp, frame[0] @ jacr,
                     frame[1] @ jacr, frame[2] @ jacr])  # (5, nv)

  invweight0 = jnp.asarray(m.body_invweight0)  # may be traced already
  invw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
  friction = con.friction[i]
  fri0 = friction[0]
  impratio_invsqrt = 1.0 / jnp.sqrt(jnp.maximum(m.opt.impratio, _MINVAL))
  invw_pyr = (invw + fri0 * fri0 * invw) * 2.0 * fri0 * fri0 * (
      impratio_invsqrt * impratio_invsqrt)

  out = []
  for r in range(stride):
    k = r // 2 + 1  # friction dim index for this pyramid edge
    is_frictionless_row = (dim == 1) & (r == 0)
    pyr_exists = (dim > 1) & (r < 2 * (dim - 1))
    exists = active_con & (is_frictionless_row | pyr_exists)
    frii = friction[k - 1]
    sign = 1.0 if r % 2 == 0 else -1.0
    j_pyr = jn + sign * frii * jdirs[k - 1]
    J = jnp.where(is_frictionless_row, jn, j_pyr)
    iw = jnp.where(dim == 1, invw, invw_pyr)
    vel = J @ d.qvel
    ctype = jnp.where(dim == 1, ConstraintType.CONTACT_FRICTIONLESS,
                      ConstraintType.CONTACT_PYRAMIDAL).astype(jnp.int32)
    row = _row(m, J, pos, pos, iw, con.solref[i], con.solimp[i],
               includemargin, vel, 0.0, 0, i, exists)
    row['type'] = ctype
    out.append(row)
  del invweight0
  # stack rows -> (stride, ...)
  return {key: jnp.stack([r[key] for r in out]) for key in out[0]}
