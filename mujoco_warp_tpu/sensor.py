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
from .types import Data, DisableBit, Model, ObjType, SensorType

# sensor types by stage (mjSTAGE_POS=1, VEL=2, ACC=3 via sensor_needstage)
SUPPORTED_SENSORS = {
    SensorType.JOINTPOS, SensorType.JOINTVEL, SensorType.ACTUATORPOS,
    SensorType.ACTUATORVEL, SensorType.ACTUATORFRC, SensorType.BALLQUAT,
    SensorType.BALLANGVEL, SensorType.FRAMEPOS, SensorType.FRAMEXAXIS,
    SensorType.FRAMEYAXIS, SensorType.FRAMEZAXIS, SensorType.FRAMEQUAT,
    SensorType.SUBTREECOM, SensorType.SUBTREELINVEL,
    SensorType.SUBTREEANGMOM, SensorType.CLOCK, SensorType.GYRO,
    SensorType.VELOCIMETER, SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL,
    SensorType.JOINTACTFRC,
}


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


def sensor_pos(m: Model, d: Data) -> Data:
  if m.nsensor == 0 or m.opt.disableflags & DisableBit.SENSOR:
    return d
  sd = d.sensordata
  for s in range(m.nsensor):
    if m.sensor_needstage[s] != 1:  # mjSTAGE_POS
      continue
    stype = m.sensor_type[s]
    adr = m.sensor_adr[s]
    objid = m.sensor_objid[s]
    objtype = m.sensor_objtype[s]
    if stype == SensorType.JOINTPOS:
      sd = _write(sd, adr, d.qpos[m.jnt_qposadr[objid]])
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
        raise NotImplementedError('framequat with reference frame')
      sd = _write(sd, adr, q)
    elif stype == SensorType.SUBTREECOM:
      sd = _write(sd, adr, d.subtree_com[objid])
    elif stype == SensorType.CLOCK:
      sd = _write(sd, adr, d.time)
    else:
      raise NotImplementedError(f'pos sensor {stype}')
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
    adr = m.sensor_adr[s]
    objid = m.sensor_objid[s]
    objtype = m.sensor_objtype[s]
    if stype == SensorType.JOINTVEL:
      sd = _write(sd, adr, d.qvel[m.jnt_dofadr[objid]])
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
      if m.sensor_refid[s] >= 0:
        raise NotImplementedError('frame vel with reference frame')
      sd = _write(sd, adr,
                  vel[3:] if stype == SensorType.FRAMELINVEL else vel[:3])
    elif stype == SensorType.SUBTREELINVEL:
      sd = _write(sd, adr, d.subtree_linvel[objid])
    elif stype == SensorType.SUBTREEANGMOM:
      sd = _write(sd, adr, d.subtree_angmom[objid])
    else:
      raise NotImplementedError(f'vel sensor {stype}')
  return d.replace(sensordata=sd)


def sensor_acc(m: Model, d: Data) -> Data:
  if m.nsensor == 0 or m.opt.disableflags & DisableBit.SENSOR:
    return d
  sd = d.sensordata
  for s in range(m.nsensor):
    if m.sensor_needstage[s] != 3:  # mjSTAGE_ACC
      continue
    stype = m.sensor_type[s]
    adr = m.sensor_adr[s]
    objid = m.sensor_objid[s]
    if stype == SensorType.ACTUATORFRC:
      sd = _write(sd, adr, d.actuator_force[objid])
    elif stype == SensorType.JOINTACTFRC:
      sd = _write(sd, adr, d.qfrc_actuator[m.jnt_dofadr[objid]])
    else:
      raise NotImplementedError(f'acc sensor {stype}')
  return d.replace(sensordata=sd)


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
  ke = 0.5 * jnp.dot(d.qvel, jnp.einsum(
      'ij,j->i', d.qM, d.qvel, precision=jax.lax.Precision.HIGHEST))
  return d.replace(energy=d.energy.at[1].set(ke))
