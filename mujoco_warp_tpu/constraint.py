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
  (reference constraint.py:_efc_row; mj_assignRef/mj_getImpedance).
  Batch-generic: solref (..., 2), solimp (..., 5), pos_imp (...)."""
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  dmin = jnp.clip(solimp[..., 0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  width = jnp.maximum(solimp[..., 2], _MINVAL)
  mid = jnp.clip(solimp[..., 3], _MINIMP, _MAXIMP)
  power = jnp.maximum(solimp[..., 4], 1.0)

  if not m.opt.disableflags & DisableBit.REFSAFE:
    timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep)

  dmax_sq = dmax * dmax
  k = 1.0 / jnp.maximum(dmax_sq * timeconst * timeconst * dampratio *
                        dampratio, _MINVAL)
  b = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k = jnp.where(solref[..., 0] <= 0, -solref[..., 0] / dmax_sq, k)
  b = jnp.where(solref[..., 1] <= 0, -solref[..., 1] / dmax, b)

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
  """Finish one efc row (or a batch of rows — all args broadcast over a
  leading axis); inactive rows get D = 0."""
  k, b, imp = _kbi(m, solref, solimp, pos_imp)
  d_val = 1.0 / jnp.maximum(invweight * (1.0 - imp) / imp, _MINVAL)
  aref = -k * imp * pos_aref - b * vel
  act = jnp.asarray(active, jnp.float32)
  batch = J.shape[:-1]
  return dict(
      J=J, pos=jnp.broadcast_to(pos_aref + margin, batch),
      margin=jnp.broadcast_to(jnp.asarray(margin, J.dtype), batch),
      D=jnp.broadcast_to(d_val * act, batch),
      vel=jnp.broadcast_to(vel, batch),
      aref=jnp.broadcast_to(aref * act, batch),
      frictionloss=jnp.broadcast_to(
          jnp.asarray(frictionloss, J.dtype) * act, batch),
      type=jnp.broadcast_to(jnp.asarray(ctype, jnp.int32), batch),
      id=jnp.broadcast_to(jnp.asarray(cid, jnp.int32), batch),
      active=jnp.broadcast_to(jnp.asarray(active, bool), batch))


def _stack(rows, nv, dtype):
  """Concatenate row groups; each entry holds one row (scalar fields) or
  a batch of rows (leading axis)."""
  out = {}
  for key in ('J', 'pos', 'margin', 'D', 'vel', 'aref', 'frictionloss',
              'type', 'id', 'active'):
    parts = []
    for r in rows:
      v = r[key]
      want_nd = 2 if key == 'J' else 1
      if v.ndim < want_nd:
        v = v[None]
      parts.append(v)
    out[key] = jnp.concatenate(parts, axis=0)
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
    elif etype == EqType.TENDON:
      t1, t2 = m.eq_obj1id[i], m.eq_obj2id[i]
      J = d.ten_J[t1]
      L1 = d.ten_length[t1]
      if t2 > -1:
        dif = d.ten_length[t2] - m.tendon_length0[t2]
        rhs = data[0] + dif * (data[1] + dif * (
            data[2] + dif * (data[3] + dif * data[4])))
        deriv = data[1] + dif * (2 * data[2] + dif * (
            3 * data[3] + dif * 4 * data[4]))
        pos = L1 - m.tendon_length0[t1] - rhs
        J = J - deriv * d.ten_J[t2]
        invweight = m.tendon_invweight0[t1] + m.tendon_invweight0[t2]
      else:
        pos = L1 - m.tendon_length0[t1] - data[0]
        invweight = m.tendon_invweight0[t1]
      vel = J @ d.qvel
      rows.append(_row(m, J, pos, pos, invweight, solref, solimp, 0.0,
                       vel, 0.0, ConstraintType.EQUALITY, i, active))
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
    elif etype == EqType.FLEX:
      # one row per flex edge: pos = length - length0, J = +-edge dir at
      # the endpoint vertex dofs (reference constraint.py:677-760)
      fx = m.flex_meta
      f = m.eq_obj1id[i]
      ea, en = fx.edgeadr[f], fx.edgenum[f]
      # static topology from flex_meta (numpy) — the m.flex_edge leaf is
      # a tracer inside jit(step) and must not be read here
      edge_np = np.asarray(fx.edge, np.int32).reshape(fx.nedge, 2)[ea:ea + en]
      dofadr = np.asarray(fx.vert_dofadr)
      vert = d.flexvert_xpos
      x0 = vert[edge_np[:, 0]]
      x1 = vert[edge_np[:, 1]]
      vec = x1 - x0
      length = d.flexedge_length[ea:ea + en]
      dirv = vec / jnp.maximum(length, 1e-15)[:, None]
      J = jnp.zeros((en, nv), dtype)
      rowix = np.arange(en)
      for side, sign in ((1, 1.0), (0, -1.0)):
        vd = dofadr[edge_np[:, side]]
        valid = vd >= 0
        cols = np.where(valid[:, None], vd[:, None] + np.arange(3), 0)
        vals = jnp.where(jnp.asarray(valid)[:, None], sign * dirv, 0.0)
        J = J.at[rowix[:, None], cols].add(vals)
      pos = length - m.flexedge_length0[ea:ea + en]
      invw = m.flexedge_invweight0[ea:ea + en]
      vel = d.flexedge_velocity[ea:ea + en]
      k = jnp.ones((en,), dtype)
      rows.append(_row(m, J, pos, pos, invw,
                       jnp.broadcast_to(solref, (en, 2)),
                       jnp.broadcast_to(solimp, (en, 5)),
                       k * 0.0, vel, k * 0.0,
                       ConstraintType.EQUALITY, i, active))
    else:
      raise NotImplementedError(f'equality type {etype}')
  def _nrows(rs):
    return sum(r['J'].shape[0] if r['J'].ndim > 1 else 1 for r in rs)

  assert _nrows(rows) == ne, (_nrows(rows), ne)

  # --- dof friction (vectorized group) ---------------------------------------
  fr_disabled = bool(m.opt.disableflags & DisableBit.FRICTIONLOSS)
  fr_ids = [i for i in range(nv) if m.dof_hasfrictionloss[i]]
  if fr_ids:
    ids = np.asarray(fr_ids)
    onehot = jnp.asarray(np.eye(nv, dtype=np.float32)[ids], dtype)
    k = len(fr_ids)
    rows.append(_row(
        m, onehot, jnp.zeros(k, dtype), jnp.zeros(k, dtype),
        m.dof_invweight0[ids], m.dof_solref[ids], m.dof_solimp[ids],
        jnp.zeros(k, dtype), d.qvel[ids], m.dof_frictionloss[ids],
        ConstraintType.FRICTION_DOF, jnp.asarray(ids, jnp.int32),
        jnp.full(k, not fr_disabled, bool)))

  # --- tendon friction --------------------------------------------------------
  for t in range(m.ntendon):
    if not m.tendon_hasfrictionloss[t]:
      continue
    # note: d.ten_velocity is a *velocity-stage* product; constraint
    # assembly runs in the position stage, so project qvel directly
    tvel = d.ten_J[t] @ d.qvel
    rows.append(_row(m, d.ten_J[t], 0.0, 0.0, m.tendon_invweight0[t],
                     m.tendon_solref_fri[t], m.tendon_solimp_fri[t], 0.0,
                     tvel, m.tendon_frictionloss[t],
                     ConstraintType.FRICTION_TENDON, t, not fr_disabled))

  # --- joint limits ----------------------------------------------------------
  # slide/hinge limits as one vectorized group; ball limits per joint
  lim_disabled = bool(m.opt.disableflags & DisableBit.LIMIT)
  sh_ids = [j for j in range(m.njnt) if m.jnt_limited[j] and
            m.jnt_type[j] in (JointType.SLIDE, JointType.HINGE)]
  if sh_ids:
    jids = np.asarray(sh_ids)
    qadr = np.asarray(m.jnt_qposadr)[jids]
    dadr = np.asarray(m.jnt_dofadr)[jids]
    jrange = m.jnt_range[jids]
    jmargin = m.jnt_margin[jids]
    q = d.qpos[qadr]
    dist_min = q - jrange[:, 0]
    dist_max = jrange[:, 1] - q
    pos = jnp.minimum(dist_min, dist_max) - jmargin
    active = (pos < 0) & (not lim_disabled)
    sign = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
    onehot = jnp.asarray(
        np.eye(nv, dtype=np.float32)[dadr], dtype) * sign[:, None]
    rows.append(_row(m, onehot, pos, pos, m.dof_invweight0[dadr],
                     m.jnt_solref[jids], m.jnt_solimp[jids], jmargin,
                     sign * d.qvel[dadr], jnp.zeros(len(sh_ids), dtype),
                     ConstraintType.LIMIT_JOINT,
                     jnp.asarray(jids, jnp.int32), active))
  for j in range(m.njnt):
    if not m.jnt_limited[j]:
      continue
    jtype = m.jnt_type[j]
    qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
    jrange, jmargin = m.jnt_range[j], m.jnt_margin[j]
    if jtype in (JointType.SLIDE, JointType.HINGE):
      pass  # handled by the vectorized group above
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

  # --- tendon limits ----------------------------------------------------------
  for t in range(m.ntendon):
    if not m.tendon_limited[t]:
      continue
    trange, tmargin = m.tendon_range[t], m.tendon_margin[t]
    L = d.ten_length[t]
    dist_min = L - trange[0]
    dist_max = trange[1] - L
    pos = jnp.minimum(dist_min, dist_max) - tmargin
    active = (pos < 0) & (not lim_disabled)
    sign = jnp.where(dist_min < dist_max, 1.0, -1.0).astype(dtype)
    J = sign * d.ten_J[t]
    tvel = d.ten_J[t] @ d.qvel
    rows.append(_row(m, J, pos, pos, m.tendon_invweight0[t],
                     m.tendon_solref_lim[t], m.tendon_solimp_lim[t],
                     tmargin, sign * tvel, 0.0,
                     ConstraintType.LIMIT_TENDON, t, active))

  static = _stack(rows, nv, dtype) if rows else None

  # --- contacts (fully vectorized over pool x pyramid rows) ------------------
  # (m.ngeom == 0: geom-less models, e.g. a bare flex, have no contacts
  # and gathering from size-0 geom tables is an XLA error)
  has_contacts = nconmax and stride and m.ngeom
  if has_contacts:
    con_rows = _contact_rows_all(m, d, stride)
  else:
    con_rows = None

  def cat(key):
    parts = []
    if static is not None:
      parts.append(static[key])
    if con_rows is not None:
      parts.append(con_rows[key])
    return jnp.concatenate(parts, axis=0)

  if has_contacts:
    efc_address = (ne + nf + nl + stride * jnp.arange(
        nconmax, dtype=jnp.int32))
    valid = d.contact.geom[:, 0] >= 0
    d = d.replace(contact=d.contact.replace(
        efc_address=jnp.where(valid, efc_address, -1)))

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


def _contact_rows_all(m: Model, d: Data, stride: int):
  """All pyramidal contact efc rows in one vectorized pass
  (reference constraint.py:1669 _contact_pyramidal): (nconmax * stride)
  rows, ~25 fused ops total instead of per-slot/per-row loops."""
  nv = m.nv
  dtype = d.qpos.dtype
  con = d.contact
  C = con.dist.shape[0]
  geom_bodyid = jnp.asarray(m.geom_bodyid)
  g1 = con.geom[:, 0]
  g2 = con.geom[:, 1]
  valid = g1 >= 0
  b1 = jnp.where(valid, geom_bodyid[jnp.maximum(g1, 0)], 0)
  b2 = jnp.where(valid, geom_bodyid[jnp.maximum(g2, 0)], 0)

  # flex contacts (geom[1] == -1): side 2 is a set of flex vertices with
  # barycentric weights. The body path is disabled for them (b2 = world)
  # and the vertex slide-dof jacobian is scattered in below; invweight
  # uses the dominant vertex's body (C uses the element vertices'
  # bodies; reference constraint.py:1762 uses contact.vert[1]).
  has_flex = bool(m.flex_meta.nflex) and (
      len(m.flex_meta.plane_pairs) or len(m.flex_meta.tri_pairs))
  if has_flex:
    fv = con.vert                                   # (C, 3)
    fw = con.vertw                                  # (C, 3)
    is_flex = valid & (g2 < 0)
    kmax = jnp.argmax(fw, axis=1)
    vmain = jnp.take_along_axis(fv, kmax[:, None], 1)[:, 0]
    vb = m.flex_vert_bodyid[jnp.maximum(vmain, 0)]
    invw2_flex = m.body_invweight0[vb, 0]
    b2 = jnp.where(is_flex, 0, b2)
  dim = con.dim                                     # (C,)
  pos = con.dist - con.includemargin                # (C,)
  active_con = (pos < 0) & valid

  frame = con.frame                                 # (C, 3, 3)
  cpos = con.pos                                    # (C, 3)
  # Projected contact jacobians WITHOUT materializing (C, 3, nv)
  # point-jacobians (4 x 63MB at 8192x24 worlds x contacts): for a frame
  # row f,   f . jacp_b[:, n] = mask_b[n] (f.L[n] - (f x off_b).A[n])
  # (triple-product identity), so everything reduces to (C, 3)x(3, nv)
  # matmuls and (C, nv) elementwise combines.
  A = d.cdof[:, :3]                                 # (nv, 3) angular
  L = d.cdof[:, 3:]                                 # (nv, 3) linear
  rootid = jnp.asarray(m.body_rootid)
  off1 = cpos - d.subtree_com[rootid[b1]]           # (C, 3)
  off2 = cpos - d.subtree_com[rootid[b2]]
  mask1 = m.body_dof_ancestor_mask[b1]              # (C, nv)
  mask2 = m.body_dof_ancestor_mask[b2]
  dm = mask2 - mask1
  FL = jnp.einsum('cri,ni->crn', frame, L, **_EINSUM)   # (C, 3, nv)
  FA = jnp.einsum('cri,ni->crn', frame, A, **_EINSUM)
  q1 = jnp.cross(frame, off1[:, None, :])           # (C, 3r, 3)
  q2 = jnp.cross(frame, off2[:, None, :])
  QA1 = jnp.einsum('cri,ni->crn', q1, A, **_EINSUM)
  QA2 = jnp.einsum('cri,ni->crn', q2, A, **_EINSUM)
  # f_r . jacp_diff and f_r . jacr_diff for all three frame rows
  jp = (mask2[:, None, :] * (FL - QA2) -
        mask1[:, None, :] * (FL - QA1))             # (C, 3, nv)
  if has_flex:
    # scatter the weighted vertex slide-dof columns:
    #   jp[c, r, dof(v_k) + x] += w_k * frame[c, r, x]
    dofs = m.flex_vert_dofadr[jnp.maximum(fv, 0)]   # (C, 3)
    wvalid = (fv >= 0) & (dofs >= 0) & is_flex[:, None]
    w = jnp.where(wvalid, fw, 0.0)
    cols = jnp.where(wvalid, dofs, 0)
    ci = jnp.arange(C)[:, None, None, None]
    ri = jnp.arange(3)[None, :, None, None]
    colsx = (cols[:, None, :, None] +
             jnp.arange(3)[None, None, None, :])    # (C, 1, 3k, 3x)
    vals = w[:, None, :, None] * frame[:, :, None, :]   # (C, 3r, 3k, 3x)
    jp = jp.at[ci, ri, colsx].add(vals)
  jr = dm[:, None, :] * FA
  jn = jp[:, 0]                                     # (C, nv)
  jdirs = jnp.concatenate([jp[:, 1:3], jr], axis=1)  # (C, 5, nv)

  invw2 = m.body_invweight0[b2, 0]
  if has_flex:
    invw2 = jnp.where(is_flex, invw2_flex, invw2)
  invw = m.body_invweight0[b1, 0] + invw2           # (C,)
  friction = con.friction                           # (C, 5)
  fri0 = friction[:, 0]
  impratio_invsqrt = 1.0 / jnp.sqrt(jnp.maximum(m.opt.impratio, _MINVAL))
  invw_pyr = (invw + fri0 * fri0 * invw) * 2.0 * fri0 * fri0 * (
      impratio_invsqrt * impratio_invsqrt)

  import numpy as np
  S = stride
  flat = lambda x: x.reshape((C * S,) + x.shape[2:])
  rep = lambda x: jnp.broadcast_to(x[:, None], (C, S)).reshape(C * S)

  if m.opt.cone == ConeType.ELLIPTIC:
    # Elliptic rows (reference constraint.py:1940; C values verified
    # empirically): row 0 normal (standard impedance), rows j friction
    # direction jacobians with D_j = D_0 * impratio * (mu_1/mu_j)^2 and
    # aref_j = -b * vel_j (damping only; solreffriction overrides b).
    r = np.arange(S)
    k, b, imp = _kbi(m, con.solref, con.solimp, pos)     # (C,) each
    d0 = 1.0 / jnp.maximum(invw * (1.0 - imp) / imp, _MINVAL)
    mu1 = friction[:, 0]
    # friction coefficient per row (C, S); row 0 unused
    fr_row = friction[:, np.clip(r - 1, 0, 4)]            # (C, S)
    d_fr = d0[:, None] * m.opt.impratio * (
        fr_row / jnp.maximum(mu1[:, None], _MINVAL)) ** 2
    # b for friction rows: solreffriction when set (reference
    # constraint.py), else the normal row's b
    srf = con.solreffriction                              # (C, 2)
    use_srf = jnp.any(jnp.abs(srf) > 1e-12, axis=1)
    b_f = jnp.where(use_srf, 2.0 / jnp.maximum(
        jnp.clip(con.solimp[:, 1], _MINIMP, _MAXIMP) * srf[:, 0],
        _MINVAL), b)
    J = jnp.concatenate([jn[:, None, :], jdirs], axis=1)[:, :S]  # (C,S,nv)
    vel = jnp.einsum('csn,n->cs', J, d.qvel, **_EINSUM)
    is_normal = jnp.asarray(r == 0)[None, :]
    exists = active_con[:, None] & (jnp.asarray(r)[None, :] <
                                    jnp.maximum(dim[:, None], 1))
    act = exists.astype(dtype)
    D = jnp.where(is_normal, d0[:, None], d_fr) * act
    aref = jnp.where(is_normal,
                     -k[:, None] * imp[:, None] * pos[:, None] -
                     b[:, None] * vel,
                     -b_f[:, None] * vel) * act
    ctype = jnp.where(dim == 1, ConstraintType.CONTACT_FRICTIONLESS,
                      ConstraintType.CONTACT_ELLIPTIC).astype(jnp.int32)
    return dict(
        J=flat(J), pos=rep(pos + con.includemargin),
        margin=rep(con.includemargin), D=flat(D), vel=flat(vel),
        aref=flat(aref), frictionloss=jnp.zeros(C * S, dtype),
        type=rep(ctype), id=rep(jnp.arange(C, dtype=jnp.int32)),
        active=flat(exists))

  r = np.arange(stride)
  kidx = r // 2 + 1                                  # friction dim index
  sign = jnp.asarray(np.where(r % 2 == 0, 1.0, -1.0), dtype)   # (S,)
  # exists masks: (C, S)
  is_fl_row = (dim[:, None] == 1) & jnp.asarray(r == 0)[None, :]
  pyr_exists = (dim[:, None] > 1) & (
      jnp.asarray(r)[None, :] < 2 * (dim[:, None] - 1))
  exists = active_con[:, None] & (is_fl_row | pyr_exists)

  frii = friction[:, kidx - 1]                       # (C, S)
  j_pyr = jn[:, None, :] + (sign[None, :, None] * frii[..., None] *
                            jdirs[:, kidx - 1, :])  # (C, S, nv)
  J = jnp.where(is_fl_row[..., None], jn[:, None, :], j_pyr)
  iw = jnp.broadcast_to(
      jnp.where(dim[:, None] == 1, invw[:, None], invw_pyr[:, None]),
      (C, stride))                                   # (C, S)
  vel = jnp.einsum('csn,n->cs', J, d.qvel, **_EINSUM)
  ctype = jnp.where(dim == 1, ConstraintType.CONTACT_FRICTIONLESS,
                    ConstraintType.CONTACT_PYRAMIDAL).astype(jnp.int32)

  rows = _row(
      m, flat(J), rep(pos), rep(pos), flat(iw),
      jnp.broadcast_to(con.solref[:, None, :], (C, S, 2)).reshape(C * S, 2),
      jnp.broadcast_to(con.solimp[:, None, :], (C, S, 5)).reshape(C * S, 5),
      rep(con.includemargin), flat(vel), jnp.zeros(C * S, dtype),
      0, rep(jnp.arange(C, dtype=jnp.int32)), flat(exists))
  rows['type'] = rep(ctype)
  return rows
