"""Sensor evaluation, staged as pos/vel/acc like the reference
(mujoco_warp/_src/sensor.py:761,1377,2447). Sensors are dispatched from
static metadata, so each model compiles only the sensors it has.

Implemented subset grows over time; io.put_model validates that a model
only uses supported types (same policy as reference io.py:90-174).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math
from . import smooth
from . import support
from .types import Data, DisableBit, Model, ObjType, SensorType

# sensor types by stage (mjSTAGE_POS=1, VEL=2, ACC=3 via sensor_needstage)
SUPPORTED_SENSORS = {
    SensorType.JOINTPOS, SensorType.JOINTVEL, SensorType.ACTUATORPOS,
    SensorType.ACTUATORVEL, SensorType.ACTUATORFRC, SensorType.BALLQUAT,
    SensorType.BALLANGVEL, SensorType.FRAMEPOS, SensorType.FRAMEXAXIS,
    SensorType.FRAMEYAXIS, SensorType.FRAMEZAXIS, SensorType.FRAMEQUAT,
    SensorType.SUBTREECOM, SensorType.SUBTREELINVEL,
    SensorType.SUBTREEANGMOM, SensorType.CLOCK, SensorType.GYRO,
    SensorType.TENDONPOS, SensorType.TENDONVEL,
    SensorType.VELOCIMETER, SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL,
    SensorType.JOINTACTFRC,
    SensorType.ACCELEROMETER, SensorType.FORCE, SensorType.TORQUE,
    SensorType.FRAMELINACC, SensorType.FRAMEANGACC, SensorType.TOUCH,
    SensorType.MAGNETOMETER, SensorType.E_POTENTIAL, SensorType.E_KINETIC,
    SensorType.RANGEFINDER,
    SensorType.JOINTLIMITPOS, SensorType.JOINTLIMITVEL,
    SensorType.JOINTLIMITFRC, SensorType.TENDONLIMITPOS,
    SensorType.TENDONLIMITVEL, SensorType.TENDONLIMITFRC,
    SensorType.TENDONACTFRC, SensorType.CAMPROJECTION,
    SensorType.GEOMDIST, SensorType.GEOMNORMAL, SensorType.GEOMFROMTO,
    SensorType.INSIDESITE, SensorType.CONTACT, SensorType.TACTILE,
    # USER sensordata is produced by the user's sensor_fn callback
    # (forward.forward sensor_fn hook == C mjcb_sensor); stages skip it
    SensorType.USER,
}


def _inside_volume(gtype: int, size, pos_local):
  """Point-inside test for a site volume (reference sensor.py
  inside_geom; used by the contact sensor's site filter)."""
  x, y, z = pos_local[0], pos_local[1], pos_local[2]
  from .types import GeomType
  if gtype == GeomType.SPHERE:
    return jnp.sum(pos_local * pos_local) <= size[0] * size[0]
  if gtype == GeomType.CAPSULE:
    zc = jnp.clip(z, -size[1], size[1])
    dd = x * x + y * y + (z - zc) ** 2
    return dd <= size[0] * size[0]
  if gtype == GeomType.ELLIPSOID:
    return ((x / size[0]) ** 2 + (y / size[1]) ** 2 +
            (z / size[2]) ** 2) <= 1.0
  if gtype == GeomType.CYLINDER:
    return (x * x + y * y <= size[0] * size[0]) & (
        jnp.abs(z) <= size[1])
  # box
  return ((jnp.abs(x) <= size[0]) & (jnp.abs(y) <= size[1]) &
          (jnp.abs(z) <= size[2]))


def _contact_sensor(m: Model, d: Data, sd, s: int):
  """mjSENS_CONTACT: match contacts against (obj, ref), reduce, and
  emit dataspec fields per slot (reference sensor.py:1750-1960,
  2256-2446; C mjSENS_CONTACT)."""
  import numpy as np
  from . import support
  intprm = m.sensor_intprm[s]
  dataspec, reduce_op = int(intprm[0]), int(intprm[1])
  adr, dim = m.sensor_adr[s], m.sensor_dim[s]
  objtype, objid = m.sensor_objtype[s], m.sensor_objid[s]
  reftype, refid = m.sensor_reftype[s], m.sensor_refid[s]
  dtype = d.qpos.dtype
  con = d.contact
  C = con.dist.shape[0]

  fields = [('found', 1), ('force', 3), ('torque', 3), ('dist', 1),
            ('pos', 3), ('normal', 3), ('tangent', 3)]
  active_fields = [(name, w) for i, (name, w) in enumerate(fields)
                   if dataspec & (1 << i)]
  size = sum(w for _, w in active_fields)
  num = dim // size
  if C == 0:
    return sd.at[adr:adr + dim].set(0.0)

  geom_bodyid = np.asarray(m.geom_bodyid)
  g1 = con.geom[:, 0]
  g2 = con.geom[:, 1]
  validc = g1 >= 0
  b1 = jnp.take(jnp.asarray(geom_bodyid), jnp.maximum(g1, 0))
  b2 = jnp.take(jnp.asarray(geom_bodyid), jnp.maximum(g2, 0))

  def check(otype, oid, b, g):
    if otype in (ObjType.UNKNOWN, ObjType.SITE):
      return jnp.ones(C, bool)
    if otype == ObjType.GEOM:
      return g == oid
    if otype == ObjType.BODY:
      return b == oid
    if otype == ObjType.XBODY:
      anc = np.zeros(m.nbody, bool)
      for k in range(m.nbody):
        bb = k
        while bb > oid:
          bb = m.body_parentid[bb]
        anc[k] = (bb == oid)
      return jnp.take(jnp.asarray(anc), b)
    raise NotImplementedError(f'contact sensor objtype {otype}')

  m11 = check(objtype, objid, b1, g1)
  m12 = check(objtype, objid, b2, g2)
  m21 = check(reftype, refid, b1, g1)
  m22 = check(reftype, refid, b2, g2)
  match = (m11 | m12) & (m21 | m22) & validc

  if objtype == ObjType.SITE:
    rel = con.pos - d.site_xpos[objid][None, :]
    local = jnp.einsum('ij,cj->ci', d.site_xmat[objid].T, rel)
    match = match & jax.vmap(
        lambda p: _inside_volume(m.site_type[objid],
                                 m.site_size[objid], p))(local)

  known_obj = objtype != ObjType.UNKNOWN
  known_ref = reftype != ObjType.UNKNOWN
  direction = jnp.ones(C, dtype)
  if known_obj and known_ref:
    order_reg = m11 & m22
    order_rev = m12 & m21
    match = match & (order_reg | order_rev)
    direction = jnp.where(order_rev & ~order_reg, -1.0, 1.0)
  elif known_obj:
    direction = jnp.where(m11, 1.0, -1.0)
  elif known_ref:
    direction = jnp.where(m22, 1.0, -1.0)

  nmatch = jnp.sum(match.astype(jnp.int32))
  need_force = any(n in ('force', 'torque') for n, _ in active_fields
                   ) or reduce_op in (2, 3)
  if need_force:
    ft = jax.vmap(lambda i: support.contact_force(m, d, i))(
        jnp.arange(C))                            # (C, 6) contact frame
  else:
    ft = jnp.zeros((C, 6), dtype)

  out = jnp.zeros(dim, dtype)
  if reduce_op == 3:  # netforce
    w = jnp.linalg.norm(ft[:, :3], axis=1) * match
    f_glob = jnp.einsum('cij,cj->ci', con.frame.transpose(0, 2, 1),
                        ft[:, :3] * direction[:, None])
    t_glob = jnp.einsum('cij,cj->ci', con.frame.transpose(0, 2, 1),
                        ft[:, 3:] * direction[:, None])
    mk = match.astype(dtype)[:, None]
    net_force = jnp.sum(mk * f_glob, axis=0)
    net_torque = jnp.sum(mk * (t_glob + jnp.cross(con.pos, f_glob)),
                         axis=0)
    wsum = jnp.maximum(jnp.sum(w), 1e-15)
    net_pos = jnp.sum(w[:, None] * con.pos, axis=0) / wsum
    net_torque = net_torque - jnp.cross(net_pos, net_force)
    vals = dict(found=jnp.array([nmatch], dtype),
                force=net_force, torque=net_torque,
                dist=jnp.zeros(1, dtype), pos=net_pos,
                normal=jnp.array([1.0, 0.0, 0.0], dtype),
                tangent=jnp.array([0.0, 1.0, 0.0], dtype))
    off = 0
    for name, wd in active_fields:
      out = out.at[off:off + wd].set(vals[name])
      off += wd
  else:
    if reduce_op == 1:    # mindist
      crit = con.dist
    elif reduce_op == 2:  # maxforce
      crit = -jnp.sum(ft[:, :3] ** 2, axis=1)
    else:                 # none: stable contact-pool order
      crit = jnp.arange(C, dtype=dtype)
    key = jnp.where(match, -crit, -jnp.inf)
    _, sel = jax.lax.top_k(key, min(num, C))
    sel_valid = match[sel]
    for slot in range(min(num, C)):
      cid = sel[slot]
      ok = sel_valid[slot]
      dirv = direction[cid]
      vals = dict(
          found=jnp.array([nmatch], dtype).astype(dtype),
          force=jnp.stack([ft[cid, 0], ft[cid, 1], dirv * ft[cid, 2]]),
          torque=jnp.stack([ft[cid, 3], ft[cid, 4], dirv * ft[cid, 5]]),
          dist=con.dist[cid][None],
          pos=con.pos[cid],
          normal=dirv * con.frame[cid, 0],
          tangent=dirv * con.frame[cid, 1])
      off = slot * size
      for name, wd in active_fields:
        val = jnp.where(ok, vals[name].astype(dtype), 0.0)
        out = out.at[off:off + wd].set(val)
        off += wd
  return sd.at[adr:adr + dim].set(out)


def _limit_row(m, d, ctype, objid, field):
  """Read a value off the (statically-addressed) limit efc row of a
  joint/tendon via masking; 0 when the row is inactive."""
  from .types import ConstraintType
  mask = (d.efc_type == int(ctype)) & (d.efc_id == objid) & d.efc_active
  maskf = mask.astype(d.qpos.dtype)
  return jnp.sum(field * maskf)


def _obj_frame(m: Model, d: Data, objtype: int, objid: int):
  """World pose of a sensor attachment object."""
  if objtype == ObjType.BODY:
    return d.xipos[objid], d.ximat[objid]
  if objtype == ObjType.XBODY:
    return d.xpos[objid], d.xmat[objid]
  if objtype == ObjType.GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid]
  if objtype == ObjType.SITE:
    return d.site_xpos[objid], d.site_xmat[objid]
  if objtype == ObjType.CAMERA:
    return d.cam_xpos[objid], d.cam_xmat[objid]
  raise NotImplementedError(f'sensor objtype {objtype}')


def _obj_quat(m: Model, d: Data, objtype: int, objid: int):
  """World orientation quaternion of a sensor object."""
  if objtype == ObjType.BODY:
    return math.mul_quat(d.xquat[objid], m.body_iquat[objid])
  if objtype == ObjType.XBODY:
    return d.xquat[objid]
  if objtype == ObjType.GEOM:
    return math.mul_quat(d.xquat[m.geom_bodyid[objid]], m.geom_quat[objid])
  if objtype == ObjType.SITE:
    return math.mul_quat(d.xquat[m.site_bodyid[objid]], m.site_quat[objid])
  raise NotImplementedError(f'obj quat for type {objtype}')


def _obj_body(m: Model, objtype: int, objid: int) -> int:
  if objtype in (ObjType.BODY, ObjType.XBODY):
    return objid
  if objtype == ObjType.GEOM:
    return m.geom_bodyid[objid]
  if objtype == ObjType.SITE:
    return m.site_bodyid[objid]
  if objtype == ObjType.CAMERA:
    return m.cam_bodyid[objid]
  raise NotImplementedError(f'sensor objtype {objtype}')


def _write(sensordata, adr, value):
  value = jnp.atleast_1d(value)
  return sensordata.at[adr:adr + value.shape[0]].set(value)


def _apply_cutoff(m: Model, sd, stage: int):
  """Clamp sensor values to +-cutoff (positive-only types to [0, cutoff])
  for sensors with cutoff > 0 (C mj_sensor* postprocessing)."""
  import numpy as np
  positive = (SensorType.TOUCH, SensorType.RANGEFINDER)
  for s in range(m.nsensor):
    if m.sensor_needstage[s] != stage:
      continue
    # cutoff is a traced leaf; presence of clamping is static via shape
    adr, dim = m.sensor_adr[s], m.sensor_dim[s]
    c = m.sensor_cutoff[s]
    window = sd[adr:adr + dim]
    stype = m.sensor_type[s]
    if stype in positive:
      clamped = jnp.minimum(window, c)   # keep miss sentinels (< 0)
    else:
      clamped = jnp.clip(window, -c, c)
    sd = sd.at[adr:adr + dim].set(jnp.where(c > 0, clamped, window))
  return sd


def sensor_pos(m: Model, d: Data) -> Data:
  if m.nsensor == 0 or m.opt.disableflags & DisableBit.SENSOR:
    return d
  sd = d.sensordata
  for s in range(m.nsensor):
    if m.sensor_needstage[s] != 1:  # mjSTAGE_POS
      continue
    stype = m.sensor_type[s]
    if stype == SensorType.USER:
      continue  # filled by the user's sensor_fn callback (mjcb_sensor)
    adr = m.sensor_adr[s]
    objid = m.sensor_objid[s]
    objtype = m.sensor_objtype[s]
    if stype == SensorType.JOINTPOS:
      sd = _write(sd, adr, d.qpos[m.jnt_qposadr[objid]])
    elif stype == SensorType.TENDONPOS:
      sd = _write(sd, adr, d.ten_length[objid])
    elif stype == SensorType.ACTUATORPOS:
      sd = _write(sd, adr, d.actuator_length[objid])
    elif stype == SensorType.BALLQUAT:
      q = math.quat_normalize(
          d.qpos[m.jnt_qposadr[objid]:m.jnt_qposadr[objid] + 4])
      sd = _write(sd, adr, q)
    elif stype == SensorType.FRAMEPOS:
      pos, _ = _obj_frame(m, d, objtype, objid)
      refid = m.sensor_refid[s]
      if refid >= 0:
        rpos, rmat = _obj_frame(m, d, m.sensor_reftype[s], refid)
        pos = rmat.T @ (pos - rpos)
      sd = _write(sd, adr, pos)
    elif stype in (SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS,
                   SensorType.FRAMEZAXIS):
      _, mat = _obj_frame(m, d, objtype, objid)
      axis = mat[:, stype - SensorType.FRAMEXAXIS]
      refid = m.sensor_refid[s]
      if refid >= 0:
        _, rmat = _obj_frame(m, d, m.sensor_reftype[s], refid)
        axis = rmat.T @ axis
      sd = _write(sd, adr, axis)
    elif stype == SensorType.FRAMEQUAT:
      # compose body/geom/site orientation as quaternion
      if objtype in (ObjType.BODY,):
        q = math.mul_quat(d.xquat[objid], m.body_iquat[objid])
      elif objtype == ObjType.XBODY:
        q = d.xquat[objid]
      elif objtype == ObjType.GEOM:
        q = math.mul_quat(d.xquat[m.geom_bodyid[objid]],
                          m.geom_quat[objid])
      elif objtype == ObjType.SITE:
        q = math.mul_quat(d.xquat[m.site_bodyid[objid]],
                          m.site_quat[objid])
      else:
        raise NotImplementedError(f'framequat objtype {objtype}')
      refid = m.sensor_refid[s]
      if refid >= 0:
        rq = _obj_quat(m, d, m.sensor_reftype[s], refid)
        q = math.mul_quat(math.quat_inv(rq), q)
      sd = _write(sd, adr, q)
    elif stype == SensorType.SUBTREECOM:
      sd = _write(sd, adr, d.subtree_com[objid])
    elif stype == SensorType.JOINTLIMITPOS:
      from .types import ConstraintType
      sd = _write(sd, adr, _limit_row(m, d, ConstraintType.LIMIT_JOINT,
                                      objid, d.efc_pos - d.efc_margin))
    elif stype == SensorType.TENDONLIMITPOS:
      from .types import ConstraintType
      sd = _write(sd, adr, _limit_row(m, d, ConstraintType.LIMIT_TENDON,
                                      objid, d.efc_pos - d.efc_margin))
    elif stype == SensorType.INSIDESITE:
      # 1.0 if the object's point is inside the site volume
      # (C mjSENS_INSIDESITE; site types: sphere/ellipsoid/box/cylinder)
      site = m.sensor_refid[s]
      pos, _ = _obj_frame(m, d, objtype, objid)
      loc = d.site_xmat[site].T @ (pos - d.site_xpos[site])
      size = m.site_size[site]
      st = m.site_type[site]
      from .types import GeomType
      if st == GeomType.SPHERE:
        inside = math.norm(loc) <= size[0]
      elif st == GeomType.ELLIPSOID:
        inside = jnp.sum((loc / size) ** 2) <= 1.0
      elif st == GeomType.CYLINDER:
        inside = (jnp.sqrt(loc[0] ** 2 + loc[1] ** 2) <= size[0]) & (
            jnp.abs(loc[2]) <= size[1])
      else:  # box (and capsule approx as box)
        inside = jnp.all(jnp.abs(loc) <= size[:3])
      sd = _write(sd, adr, inside.astype(d.qpos.dtype))
    elif stype in (SensorType.GEOMDIST, SensorType.GEOMNORMAL,
                   SensorType.GEOMFROMTO):
      # geom-pair distance query via the collision machinery
      # (C mj_geomDistance); cutoff acts as the search margin
      from . import collision_driver
      g1 = objid
      g2 = m.sensor_refid[s]
      cutoff = m.sensor_cutoff[s]
      dists, poss, frames = collision_driver.collide_pair(
          m, d, g1, g2, cutoff)
      i = jnp.argmin(dists)
      dist = jnp.minimum(dists[i], cutoff)
      pos = poss[i]
      normal = frames[i][0]
      # collide_pair may have swapped geom order (by type): flip the
      # normal back to point g1 -> g2
      if m.geom_type[g1] > m.geom_type[g2]:
        normal = -normal
      hit = dists[i] < cutoff
      if stype == SensorType.GEOMDIST:
        sd = _write(sd, adr, dist)
      elif stype == SensorType.GEOMNORMAL:
        sd = _write(sd, adr, jnp.where(hit, normal, 0.0))
      else:
        p1 = pos - 0.5 * dist * normal
        p2 = pos + 0.5 * dist * normal
        fromto = jnp.where(hit, jnp.concatenate([p1, p2]),
                           jnp.zeros(6, d.qpos.dtype))
        sd = _write(sd, adr, fromto)
    elif stype == SensorType.CAMPROJECTION:
      # project the target onto the camera image (C mjSENS_CAMPROJECTION,
      # fovy path; pixel conventions verified against the oracle)
      cam = m.sensor_refid[s]
      pos, _ = _obj_frame(m, d, objtype, objid)
      pc = d.cam_xmat[cam].T @ (pos - d.cam_xpos[cam])
      W, Hres = m.cam_resolution[cam]
      f = 0.5 * Hres / jnp.tan(0.5 * m.cam_fovy[cam] * jnp.pi / 180.0)
      zsafe = jnp.where(jnp.abs(pc[2]) < 1e-12, -1e-12, pc[2])
      xpix = W / 2.0 + f * pc[0] / (-zsafe)
      ypix = Hres / 2.0 - f * pc[1] / (-zsafe)
      sd = _write(sd, adr, jnp.stack([xpix, ypix]))
    elif stype == SensorType.RANGEFINDER:
      from . import ray as ray_mod
      pos, mat = _obj_frame(m, d, objtype, objid)
      body = _obj_body(m, objtype, objid)
      _, dist = ray_mod.ray(m, d, pos, mat[:, 2], bodyexclude=body)
      sd = _write(sd, adr, dist)
    elif stype == SensorType.MAGNETOMETER:
      _, mat = _obj_frame(m, d, objtype, objid)
      sd = _write(sd, adr, mat.T @ m.opt.magnetic)
    elif stype == SensorType.E_POTENTIAL:
      d2 = energy_pos(m, d)
      sd = _write(sd, adr, d2.energy[0])
    elif stype == SensorType.E_KINETIC:
      # mjModel marks E_KINETIC needstage=POS; qM and qvel are both
      # available here (qM from crb earlier in fwd_position)
      d2 = energy_vel(m, d)
      sd = _write(sd, adr, d2.energy[1])
    elif stype == SensorType.CLOCK:
      sd = _write(sd, adr, d.time)
    else:
      raise NotImplementedError(f'pos sensor {stype}')
  sd = _apply_cutoff(m, sd, 1)
  return d.replace(sensordata=sd)


def sensor_vel(m: Model, d: Data) -> Data:
  if m.nsensor == 0 or m.opt.disableflags & DisableBit.SENSOR:
    return d
  sd = d.sensordata
  needs_subtree = any(
      m.sensor_type[s] in (SensorType.SUBTREELINVEL,
                           SensorType.SUBTREEANGMOM)
      for s in range(m.nsensor))
  if needs_subtree:
    d = smooth.subtree_vel(m, d)
  for s in range(m.nsensor):
    if m.sensor_needstage[s] != 2:  # mjSTAGE_VEL
      continue
    stype = m.sensor_type[s]
    if stype == SensorType.USER:
      continue  # filled by the user's sensor_fn callback (mjcb_sensor)
    adr = m.sensor_adr[s]
    objid = m.sensor_objid[s]
    objtype = m.sensor_objtype[s]
    if stype == SensorType.JOINTVEL:
      sd = _write(sd, adr, d.qvel[m.jnt_dofadr[objid]])
    elif stype == SensorType.TENDONVEL:
      sd = _write(sd, adr, d.ten_velocity[objid])
    elif stype == SensorType.ACTUATORVEL:
      sd = _write(sd, adr, d.actuator_velocity[objid])
    elif stype == SensorType.BALLANGVEL:
      dadr = m.jnt_dofadr[objid]
      sd = _write(sd, adr, d.qvel[dadr:dadr + 3])
    elif stype in (SensorType.GYRO, SensorType.VELOCIMETER):
      body = _obj_body(m, objtype, objid)
      pos, mat = _obj_frame(m, d, objtype, objid)
      vel = math.transform_motion(
          d.cvel[body], pos - d.subtree_com[m.body_rootid[body]], mat)
      sd = _write(sd, adr,
                  vel[:3] if stype == SensorType.GYRO else vel[3:])
    elif stype in (SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL):
      body = _obj_body(m, objtype, objid)
      pos, _ = _obj_frame(m, d, objtype, objid)
      vel = math.transform_motion(
          d.cvel[body], pos - d.subtree_com[m.body_rootid[body]])
      refid = m.sensor_refid[s]
      if refid >= 0:
        # relative to the reference object's frame (C mj_sensorVel)
        reftype = m.sensor_reftype[s]
        rbody = _obj_body(m, reftype, refid)
        rpos, rmat = _obj_frame(m, d, reftype, refid)
        rvel = math.transform_motion(
            d.cvel[rbody], rpos - d.subtree_com[m.body_rootid[rbody]])
        if stype == SensorType.FRAMELINVEL:
          rel = (vel[3:] - rvel[3:] -
                 jnp.cross(rvel[:3], pos - rpos))
          sd = _write(sd, adr, rmat.T @ rel)
        else:
          sd = _write(sd, adr, rmat.T @ (vel[:3] - rvel[:3]))
      else:
        sd = _write(sd, adr,
                    vel[3:] if stype == SensorType.FRAMELINVEL
                    else vel[:3])
    elif stype == SensorType.SUBTREELINVEL:
      sd = _write(sd, adr, d.subtree_linvel[objid])
    elif stype == SensorType.SUBTREEANGMOM:
      sd = _write(sd, adr, d.subtree_angmom[objid])
    elif stype == SensorType.E_KINETIC:
      d2 = energy_vel(m, d)
      sd = _write(sd, adr, d2.energy[1])
    elif stype == SensorType.JOINTLIMITVEL:
      from .types import ConstraintType
      sd = _write(sd, adr, _limit_row(m, d, ConstraintType.LIMIT_JOINT,
                                      objid, d.efc_vel))
    elif stype == SensorType.TENDONLIMITVEL:
      from .types import ConstraintType
      sd = _write(sd, adr, _limit_row(m, d, ConstraintType.LIMIT_TENDON,
                                      objid, d.efc_vel))
    else:
      raise NotImplementedError(f'vel sensor {stype}')
  sd = _apply_cutoff(m, sd, 2)
  return d.replace(sensordata=sd)


_RNE_POST_SENSORS = (
    SensorType.ACCELEROMETER, SensorType.FORCE, SensorType.TORQUE,
    SensorType.FRAMELINACC, SensorType.FRAMEANGACC, SensorType.TOUCH,
)


def sensor_acc(m: Model, d: Data) -> Data:
  if m.nsensor == 0 or m.opt.disableflags & DisableBit.SENSOR:
    return d
  from . import support  # local import to avoid cycle
  if any(m.sensor_type[s] in _RNE_POST_SENSORS for s in range(m.nsensor)):
    d = support.rne_postconstraint(m, d)
  sd = d.sensordata
  for s in range(m.nsensor):
    if m.sensor_needstage[s] != 3:  # mjSTAGE_ACC
      continue
    stype = m.sensor_type[s]
    if stype == SensorType.USER:
      continue  # filled by the user's sensor_fn callback (mjcb_sensor)
    adr = m.sensor_adr[s]
    objid = m.sensor_objid[s]
    objtype = m.sensor_objtype[s]
    if stype == SensorType.ACTUATORFRC:
      sd = _write(sd, adr, d.actuator_force[objid])
    elif stype == SensorType.JOINTACTFRC:
      sd = _write(sd, adr, d.qfrc_actuator[m.jnt_dofadr[objid]])
    elif stype == SensorType.JOINTLIMITFRC:
      from .types import ConstraintType
      sd = _write(sd, adr, _limit_row(m, d, ConstraintType.LIMIT_JOINT,
                                      objid, d.efc_force))
    elif stype == SensorType.TENDONLIMITFRC:
      from .types import ConstraintType
      sd = _write(sd, adr, _limit_row(m, d, ConstraintType.LIMIT_TENDON,
                                      objid, d.efc_force))
    elif stype == SensorType.TENDONACTFRC:
      # sum of actuator forces transmitted to this tendon
      total = jnp.zeros((), d.qpos.dtype)
      from .types import TrnType
      for u in range(m.nu):
        if (m.actuator_trntype[u] == TrnType.TENDON and
            m.actuator_trnid[u][0] == objid):
          total = total + d.actuator_force[u]
      sd = _write(sd, adr, total)
    elif stype == SensorType.ACCELEROMETER:
      pos, mat = _obj_frame(m, d, objtype, objid)
      acc, _ = support.object_acceleration(m, d, objtype, objid)
      sd = _write(sd, adr, mat.T @ acc[3:])
    elif stype in (SensorType.FRAMELINACC, SensorType.FRAMEANGACC):
      acc, _ = support.object_acceleration(m, d, objtype, objid)
      sd = _write(sd, adr,
                  acc[3:] if stype == SensorType.FRAMELINACC else acc[:3])
    elif stype == SensorType.FORCE:
      body = _obj_body(m, objtype, objid)
      pos, mat = _obj_frame(m, d, objtype, objid)
      offset = pos - d.subtree_com[m.body_rootid[body]]
      wrench = math.transform_force(d.cfrc_int[body], offset)
      sd = _write(sd, adr, mat.T @ wrench[3:])
    elif stype == SensorType.TORQUE:
      body = _obj_body(m, objtype, objid)
      pos, mat = _obj_frame(m, d, objtype, objid)
      offset = pos - d.subtree_com[m.body_rootid[body]]
      wrench = math.transform_force(d.cfrc_int[body], offset)
      sd = _write(sd, adr, mat.T @ wrench[:3])
    elif stype == SensorType.CONTACT:
      sd = _contact_sensor(m, d, sd, s)
    elif stype == SensorType.TOUCH:
      # sum of normal contact forces on the site's body whose contact
      # point falls inside the site volume (C mjSENS_TOUCH; sphere/box
      # site approximated by its bounding sphere here)
      body = m.site_bodyid[objid]
      site_pos = d.site_xpos[objid]
      size = m.site_size[objid]
      rad = jnp.max(size)
      nconmax = d.contact.dist.shape[0]
      geom_bodyid = jnp.asarray(m.geom_bodyid)

      def one(i):
        g1 = d.contact.geom[i, 0]
        g2 = d.contact.geom[i, 1]
        valid = (g1 >= 0) & (
            d.contact.dist[i] < d.contact.includemargin[i])
        b1 = geom_bodyid[jnp.maximum(g1, 0)]
        b2 = geom_bodyid[jnp.maximum(g2, 0)]
        on_body = (b1 == body) | (b2 == body)
        near = math.norm(d.contact.pos[i] - site_pos) < rad + 1e-6
        f = support.contact_force(m, d, i)
        return jnp.where(valid & on_body & near, jnp.maximum(f[0], 0.0),
                         0.0)

      total = jnp.sum(jax.vmap(one)(jnp.arange(nconmax))) if nconmax \
          else jnp.zeros((), d.qpos.dtype)
      sd = _write(sd, adr, total)
    elif stype == SensorType.TACTILE:
      sd = _tactile(m, d, sd, s)
    else:
      raise NotImplementedError(f'acc sensor {stype}')
  sd = _apply_cutoff(m, sd, 3)
  return d.replace(sensordata=sd)


def _tactile(m: Model, d: Data, sd, s: int):
  """mjSENS_TACTILE: per-taxel penetration pressure against geoms in
  active contact with the sensor geom's weld body (reference
  sensor.py:2085-2254 _preprocess_tactile_contacts/_sensor_tactile).

  Channel 0 (normal force) is the analytic SDF penetration depth of
  the taxel in each contacting geom, summed over geoms — this matches
  C exactly for planes and to ~1% at shallow depths for primitives
  (C evaluates an approximate discretized SDF; verified numerically).
  Channels 1/2 (only when the mesh carries a 3x normal frame) are the
  tangential relative speeds |v_rel . t|, the reference's convention."""
  import numpy as np
  from . import support
  meta = next(t for t in m.tactile_meta if t[0] == s)
  _, g, t0, T, has_frame, groups = meta
  dtype = d.qpos.dtype
  adr = m.sensor_adr[s]

  R = d.geom_xmat[g]
  xpos = m.taxel_pos[t0:t0 + T] @ R.T + d.geom_xpos[g]      # (T, 3)

  # per-geom "in active contact with the sensor weld" flags
  pw = int(m.body_weldid[m.geom_bodyid[g]])
  ngeom = m.ngeom
  geom_weld = jnp.asarray(
      np.asarray(m.body_weldid)[np.asarray(m.geom_bodyid)], jnp.int32)
  cg = d.contact.geom                                        # (C, 2)
  valid = (cg[:, 0] >= 0) & (d.contact.dist <
                             d.contact.includemargin)
  w1 = geom_weld[jnp.maximum(cg[:, 0], 0)]
  w2 = geom_weld[jnp.maximum(cg[:, 1], 0)]
  flag = jnp.zeros((ngeom + 1,), bool)
  oth1 = jnp.where(valid & (w2 == pw) & (cg[:, 1] >= 0), cg[:, 0], ngeom)
  oth2 = jnp.where(valid & (w1 == pw) & (cg[:, 1] >= 0), cg[:, 1], ngeom)
  flag = flag.at[oth1].set(True).at[oth2].set(True)[:ngeom]

  from .collision_sdf import _primitive_sdf
  press = jnp.zeros((T,), dtype)
  touch_any = jnp.zeros((T,), bool)
  vrel_sum = jnp.zeros((T, 3), dtype)
  for gtype, gids in groups:
    gl = np.asarray(gids, np.int32)
    gp = d.geom_xpos[gl]                                     # (G, 3)
    gR = d.geom_xmat[gl]                                     # (G, 3, 3)
    size = m.geom_size[gl]
    rel = xpos[:, None, :] - gp[None, :, :]                  # (T, G, 3)
    lp = jnp.einsum('gji,tgj->tgi', gR, rel)
    sdfv = jax.vmap(jax.vmap(
        lambda p, sz: _primitive_sdf(int(gtype), p, sz),
        in_axes=(0, 0)), in_axes=(0, None))(lp, size)        # (T, G)
    depth = jnp.minimum(sdfv, 0.0) * flag[gl][None, :]
    press = press + jnp.sum(-depth, axis=1)
    if has_frame:
      hit = depth < 0                                        # (T, G)
      touch_any = touch_any | jnp.any(hit, axis=1)
      # relative velocity taxel-vs-geom-body at the taxel point
      body = jnp.asarray(np.asarray(m.geom_bodyid)[gl], jnp.int32)
      root = jnp.asarray(np.asarray(m.body_rootid), jnp.int32)
      cv_s = d.cvel[pw]                                      # (6,)
      v_s = (cv_s[3:] + jnp.cross(
          cv_s[:3], xpos - d.subtree_com[root[pw]]))          # (T, 3)
      cv_o = d.cvel[body]                                    # (G, 6)
      v_o = (cv_o[:, 3:] + jnp.cross(
          cv_o[:, :3], gp - d.subtree_com[root[body]]))       # (G, 3)
      vr = v_s[:, None, :] - v_o[None, :, :]                 # (T, G, 3)
      vrel_sum = vrel_sum + jnp.sum(
          vr * hit[:, :, None].astype(dtype), axis=1)

  out = [press]
  if has_frame:
    Rt = m.taxel_tang[t0:t0 + T] @ R.T[None]                 # (T, 2, 3)
    out.append(jnp.abs(jnp.sum(vrel_sum * Rt[:, 0], -1)))
    out.append(jnp.abs(jnp.sum(vrel_sum * Rt[:, 1], -1)))
  else:
    out.extend([jnp.zeros((T,), dtype), jnp.zeros((T,), dtype)])
  return jax.lax.dynamic_update_slice(
      sd, jnp.concatenate(out).astype(dtype), (adr,))


def energy_pos(m: Model, d: Data) -> Data:
  """Potential energy (reference sensor.py:2854)."""
  grav = m.opt.gravity
  e_grav = -jnp.sum(m.body_mass * (d.xipos @ grav))
  # joint spring energy
  e_spring = jnp.zeros((), d.qpos.dtype)
  from .types import JointType
  for j in range(m.njnt):
    stiffness = m.jnt_stiffness[j]
    qadr = m.jnt_qposadr[j]
    jtype = m.jnt_type[j]
    if jtype == JointType.FREE:
      dif = d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]
      e_spring += 0.5 * stiffness * jnp.sum(dif * dif)
      dif4 = math.quat_sub(d.qpos[qadr + 3:qadr + 7],
                           m.qpos_spring[qadr + 3:qadr + 7])
      e_spring += 0.5 * stiffness * jnp.sum(dif4 * dif4)
    elif jtype == JointType.BALL:
      dif = math.quat_sub(d.qpos[qadr:qadr + 4],
                          m.qpos_spring[qadr:qadr + 4])
      e_spring += 0.5 * stiffness * jnp.sum(dif * dif)
    else:
      dif = d.qpos[qadr] - m.qpos_spring[qadr]
      e_spring += 0.5 * stiffness * dif * dif
  return d.replace(energy=d.energy.at[0].set(e_grav + e_spring))


def energy_vel(m: Model, d: Data) -> Data:
  """Kinetic energy 0.5 qvel' M qvel (reference sensor.py:2922)."""
  ke = 0.5 * jnp.dot(d.qvel, support.mul_m(m, d, d.qvel))
  return d.replace(energy=d.energy.at[1].set(ke))
