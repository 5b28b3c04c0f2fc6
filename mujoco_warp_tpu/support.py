"""Support operations: mass-matrix products, Cartesian force mapping,
Jacobians, RL state capture (reference: mujoco_warp/_src/support.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math
from .types import Data, DisableBit, Model, State

_EINSUM = dict(precision=jax.lax.Precision.HIGHEST)

# (flag, Data field, per-world flat size fn)
_STATE_FIELDS = (
    (State.TIME, 'time', lambda m: 1),
    (State.QPOS, 'qpos', lambda m: m.nq),
    (State.QVEL, 'qvel', lambda m: m.nv),
    (State.ACT, 'act', lambda m: m.na),
    (State.WARMSTART, 'qacc_warmstart', lambda m: m.nv),
    (State.CTRL, 'ctrl', lambda m: m.nu),
    (State.QFRC_APPLIED, 'qfrc_applied', lambda m: m.nv),
    (State.XFRC_APPLIED, 'xfrc_applied', lambda m: m.nbody * 6),
    (State.EQ_ACTIVE, 'eq_active', lambda m: m.neq),
    (State.MOCAP_POS, 'mocap_pos', lambda m: m.nmocap * 3),
    (State.MOCAP_QUAT, 'mocap_quat', lambda m: m.nmocap * 4),
)


def state_size(m: Model, spec: int) -> int:
  """Flat size of the state vector for a State bitflag spec
  (C mj_stateSize)."""
  return sum(size(m) for flag, _, size in _STATE_FIELDS if spec & flag)


def get_state(m: Model, d: Data, spec: int = State.INTEGRATION
              ) -> jax.Array:
  """Capture the selected state components as one flat vector
  (reference support.py:572; C mj_getState). Works single-world or
  batched (leading world axis preserved)."""
  batch = d.qpos.shape[:-1]
  parts = []
  for flag, name, _ in _STATE_FIELDS:
    if not spec & flag:
      continue
    v = getattr(d, name)
    v = jnp.asarray(v, d.qpos.dtype)
    parts.append(v.reshape(batch + (-1,)))
  if not parts:
    return jnp.zeros(batch + (0,), d.qpos.dtype)
  return jnp.concatenate(parts, axis=-1)


def set_state(m: Model, d: Data, state: jax.Array,
              spec: int = State.INTEGRATION) -> Data:
  """Inverse of get_state (reference support.py:711; C mj_setState)."""
  batch = d.qpos.shape[:-1]
  adr = 0
  updates = {}
  for flag, name, size in _STATE_FIELDS:
    if not spec & flag:
      continue
    n = size(m)
    chunk = state[..., adr:adr + n]
    adr += n
    cur = getattr(d, name)
    val = chunk.reshape(batch + cur.shape[len(batch):])
    if name == 'time':
      val = val.reshape(batch)
    updates[name] = jnp.asarray(val, cur.dtype)
  return d.replace(**updates)


def mul_m(m: Model, d: Data, vec: jax.Array) -> jax.Array:
  """qM @ vec (reference support.py:133): dense einsum, or the packed
  gather/scatter product in sparse-qM mode (reference gather-CSR
  qM_mulm_*, support.py:68)."""
  if m.qm_meta is not None:
    from . import sparse as sparse_mod
    return sparse_mod.mul_m(m.qm_meta, d.qM, vec)
  return jnp.einsum('ij,j->i', d.qM, vec, **_EINSUM)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Map Cartesian wrenches d.xfrc_applied (applied at body com, world
  frame) to generalized forces (reference support.py:229)."""
  force = d.xfrc_applied[:, :3]
  torque = d.xfrc_applied[:, 3:]
  offset = d.xipos - d.subtree_com[list(m.body_rootid), :]
  cfrc = jnp.concatenate([torque + jnp.cross(offset, force), force], axis=1)
  csub = jnp.einsum('bc,ci->bi', m.body_subtree_mask, cfrc, **_EINSUM)
  return jnp.einsum('ji,ji->j', d.cdof, csub[list(m.dof_bodyid), :],
                    **_EINSUM)


def jac(m: Model, d: Data, point: jax.Array, bodyid: int
        ) -> tuple[jax.Array, jax.Array]:
  """Dense translation/rotation Jacobians (3, nv) of a world-frame point
  on a body (reference support.py:473; C mj_jac)."""
  mask = m.body_dof_ancestor_mask[bodyid]  # (nv,)
  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  jacr = d.cdof[:, :3] * mask[:, None]
  jacp = (d.cdof[:, 3:] - jnp.cross(
      jnp.broadcast_to(offset, (m.nv, 3)), d.cdof[:, :3])) * mask[:, None]
  return jacp.T, jacr.T


def jac_dyn(m: Model, d: Data, point: jax.Array, bodyid: jax.Array
            ) -> tuple[jax.Array, jax.Array]:
  """jac() with a traced body id: masks/gathers instead of static index.
  Used by contact constraint assembly where the geom pair (hence body)
  varies per contact slot."""
  mask = m.body_dof_ancestor_mask[bodyid]  # (nv,) gather on traced id
  offset = point - d.subtree_com[jnp.asarray(m.body_rootid)[bodyid]]
  jacr = d.cdof[:, :3] * mask[:, None]
  jacp = (d.cdof[:, 3:] - jnp.cross(
      jnp.broadcast_to(offset, (m.nv, 3)), d.cdof[:, :3])) * mask[:, None]
  return jacp.T, jacr.T


def contact_force(m: Model, d: Data, i) -> jax.Array:
  """Decode the 6D force of contact slot i in the contact frame
  (reference support.py:354 + pyramid decode 241; C mj_contactForce).
  Traced index i; returns (6,) = (normal, tangent1, tangent2, torsion...)
  ordered as MuJoCo (force[3], torque[3]) in contact frame."""
  from .types import ConeType
  con = d.contact
  adr = con.efc_address[i]
  dim = con.dim[i]
  friction = con.friction[i]
  njmax = d.efc_force.shape[0]
  out = jnp.zeros(6, d.qpos.dtype)
  if m.opt.cone == ConeType.ELLIPTIC:
    # elliptic rows are direct forces at stride dim: force[k] =
    # efc_force[adr + k] for k < dim (C mj_contactForce elliptic branch)
    rows = jnp.arange(6)
    idx = jnp.clip(adr + rows, 0, njmax - 1)
    vals = jnp.where((adr >= 0) & (rows < dim), d.efc_force[idx], 0.0)
    return vals
  # pyramidal: rows adr .. adr + 2*(dim-1)-1 (or 1 row if dim == 1)
  maxrows = 10
  rows = jnp.arange(maxrows)
  idx = jnp.clip(adr + rows, 0, njmax - 1)
  pyr = jnp.where((adr >= 0) & (rows < 2 * (dim - 1)), d.efc_force[idx],
                  0.0)
  frictionless = jnp.where((adr >= 0) & (dim == 1), d.efc_force[
      jnp.clip(adr, 0, njmax - 1)], 0.0)
  normal = jnp.sum(pyr) + frictionless
  out = out.at[0].set(normal)
  # friction components: (pyr[2k] - pyr[2k+1]) * mu[k]
  for k in range(4):
    comp = jnp.where(dim > k + 1,
                     (pyr[2 * k] - pyr[2 * k + 1]) * friction[k], 0.0)
    out = out.at[1 + k].set(comp)
  return out


def rne_postconstraint(m: Model, d: Data) -> Data:
  """Post-solve com-frame accelerations and interaction forces
  (reference smooth.py:1501; C mj_rnePostConstraint): cacc with the
  actual qacc, cfrc_ext from applied + contact forces, cfrc_int subtree
  sums. Needed by acc-stage sensors."""
  dtype = d.qpos.dtype
  nbody = m.nbody
  # cfrc_ext: applied Cartesian wrenches at body com
  frc = d.xfrc_applied[:, :3]
  trq = d.xfrc_applied[:, 3:]
  offset = d.xipos - d.subtree_com[list(m.body_rootid), :]
  cfrc_ext = jnp.concatenate([trq + jnp.cross(offset, frc), frc], axis=1)

  # contact forces: decode each slot, accumulate on both bodies
  nconmax = d.contact.dist.shape[0]
  if nconmax and m.ngeom:
    geom_bodyid = jnp.asarray(m.geom_bodyid)

    def one(i):
      con_f = contact_force(m, d, i)
      frame = d.contact.frame[i]     # rows: normal, t1, t2
      pos = d.contact.pos[i]
      f_world = frame.T @ con_f[:3]
      t_world = frame.T @ con_f[3:]
      g1 = d.contact.geom[i, 0]
      g2 = d.contact.geom[i, 1]
      valid = (g1 >= 0) & (d.contact.dist[i] < d.contact.includemargin[i])
      b1 = jnp.where(valid, geom_bodyid[jnp.maximum(g1, 0)], 0)
      b2 = jnp.where(valid, geom_bodyid[jnp.maximum(g2, 0)], 0)
      return f_world, t_world, pos, b1, b2, valid

    f_w, t_w, pos_w, b1s, b2s, valids = jax.vmap(one)(jnp.arange(nconmax))
    # wrench about each body's com frame origin (root subtree com)
    def to_body(bids, sign):
      com = d.subtree_com[jnp.asarray(m.body_rootid)[bids]]
      r = pos_w - com
      torque = t_w + jnp.cross(r, f_w)
      w = jnp.concatenate([torque, f_w], axis=1) * sign
      w = w * valids[:, None]
      return jnp.zeros((nbody, 6), dtype).at[bids].add(w)

    # contact normal points from geom1 into geom2: force acts ON geom2
    # (+) and on geom1 (-) per MuJoCo convention
    cfrc_ext = cfrc_ext + to_body(b2s, 1.0) + to_body(b1s, -1.0)

  # cacc with actual qacc
  dof_contrib = d.cdof_dot * d.qvel[:, None] + d.cdof * d.qacc[:, None]
  cacc = jnp.einsum('bj,ji->bi', m.body_dof_ancestor_mask, dof_contrib,
                    **_EINSUM)
  if not m.opt.disableflags & DisableBit.GRAVITY:
    grav = jnp.concatenate([jnp.zeros(3, dtype), -m.opt.gravity])
    cacc = cacc + grav[None, :]
    cacc = cacc.at[0].set(grav)

  icacc = jax.vmap(math.inert_mul)(d.cinert, cacc)
  icvel = jax.vmap(math.inert_mul)(d.cinert, d.cvel)
  cfrc_com = icacc + jax.vmap(math.motion_cross_force)(d.cvel, icvel)
  net = cfrc_com - cfrc_ext
  cfrc_int = jnp.einsum('bc,ci->bi', m.body_subtree_mask, net, **_EINSUM)
  cfrc_int = cfrc_int.at[0].set(0.0)
  return d.replace(cacc=cacc, cfrc_ext=cfrc_ext, cfrc_int=cfrc_int)


def object_acceleration(m: Model, d: Data, objtype: int, objid: int):
  """6D acceleration (ang, lin) of an object frame, world-aligned at the
  object position (C mj_objectAcceleration, flg_local=0)."""
  from . import sensor as sensor_mod
  pos, _ = sensor_mod._obj_frame(m, d, objtype, objid)
  body = sensor_mod._obj_body(m, objtype, objid)
  offset = pos - d.subtree_com[m.body_rootid[body]]
  acc = math.transform_motion(d.cacc[body], offset)
  vel = math.transform_motion(d.cvel[body], offset)
  # spatial-to-conventional correction: a_lin += w x v
  corr = jnp.cross(vel[:3], vel[3:])
  return acc.at[3:].add(corr), vel


def jac_dot(m: Model, d: Data, point: jax.Array, bodyid: int
            ) -> tuple[jax.Array, jax.Array]:
  """Time derivative of the point jacobians (reference support.py:505;
  C mj_jacDot): d/dt of jac() holding the point fixed on the body.
  Requires com_vel products (cvel, cdof_dot)."""
  mask = m.body_dof_ancestor_mask[bodyid]           # (nv,)
  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  # velocity of the body-fixed point (world frame)
  pvel = math.transform_motion(d.cvel[bodyid], offset)
  v_pt = pvel[3:]
  jacr_dot = d.cdof_dot[:, :3] * mask[:, None]
  jacp_dot = (d.cdof_dot[:, 3:]
              - jnp.cross(jnp.broadcast_to(offset, (m.nv, 3)),
                          d.cdof_dot[:, :3])
              - jnp.cross(jnp.broadcast_to(v_pt, (m.nv, 3)),
                          d.cdof[:, :3])) * mask[:, None]
  return jacp_dot.T, jacr_dot.T


def apply_ft(m: Model, d: Data, force: jax.Array, torque: jax.Array,
             point: jax.Array, bodyid: int) -> jax.Array:
  """Generalized force from a wrench at a world point on a body
  (reference support.py:219; C mj_applyFT)."""
  jacp, jacr = jac(m, d, point, bodyid)
  return jnp.einsum('ij,i->j', jacp, force, **_EINSUM) + jnp.einsum(
      'ij,i->j', jacr, torque, **_EINSUM)
