"""Oracle-differential sensor tests across all three stages
(reference sensor_test.py strategy)."""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt

from fixtures import assert_close, fixture

SENSOR_MODEL = """
<mujoco>
  <option timestep="0.002" magnetic="0.3 -0.2 0.5"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 1"/>
    <body name="base" pos="0 0 0.6">
      <freejoint/>
      <geom name="torso" type="capsule" size="0.05" fromto="0 0 0 0 0 0.25"
            mass="2.0"/>
      <site name="imu" pos="0 0 0.1" size="0.01"/>
      <body name="leg" pos="0 0 0">
        <joint name="hip" type="hinge" axis="0 1 0" range="-45 45"
               damping="0.5"/>
        <geom name="thigh" type="capsule" size="0.04"
              fromto="0 0 0 0 0 -0.3" mass="1.0"/>
        <body name="foot" pos="0 0 -0.3">
          <joint name="knee" type="hinge" axis="0 1 0" range="-60 10"
                 damping="0.3"/>
          <geom name="ball" type="sphere" size="0.06" mass="0.5"/>
          <site name="sole" pos="0 0 -0.05" size="0.08"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="a_hip" joint="hip" gear="2"/>
    <motor name="a_knee" joint="knee" gear="1.5"/>
  </actuator>
  <sensor>
    <jointpos joint="hip"/>
    <jointvel joint="knee"/>
    <actuatorpos actuator="a_hip"/>
    <actuatorvel actuator="a_hip"/>
    <actuatorfrc actuator="a_knee"/>
    <jointactuatorfrc joint="hip"/>
    <framepos objtype="site" objname="imu"/>
    <framequat objtype="body" objname="foot"/>
    <framexaxis objtype="geom" objname="thigh"/>
    <framelinvel objtype="body" objname="foot"/>
    <frameangvel objtype="site" objname="imu"/>
    <framelinacc objtype="body" objname="foot"/>
    <frameangacc objtype="body" objname="leg"/>
    <subtreecom body="base"/>
    <subtreelinvel body="base"/>
    <subtreeangmom body="base"/>
    <gyro site="imu"/>
    <velocimeter site="imu"/>
    <accelerometer site="imu"/>
    <magnetometer site="imu"/>
    <force site="imu"/>
    <torque site="imu"/>
    <touch site="sole"/>
    <clock/>
  </sensor>
</mujoco>
"""


def _sensor_slices(mjm):
  out = {}
  for s in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[s], mjm.sensor_dim[s]
    stype = int(mjm.sensor_type[s])
    out.setdefault(stype, []).append(slice(adr, adr + dim))
  return out


def test_sensors_match_oracle():
  mjm, mjd, m, d = fixture(SENSOR_MODEL, qpos_noise=0.1, qvel_noise=0.3,
                           ctrl_noise=0.5, nstep=3)
  d = mjwt.forward(m, d)
  ours = np.asarray(d.sensordata)
  ref = mjd.sensordata
  for s in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[s], mjm.sensor_dim[s]
    name = mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_SENSOR, s) or \
        f'sensor{s}({mjm.sensor_type[s]})'
    np.testing.assert_allclose(
        ours[adr:adr + dim], ref[adr:adr + dim], rtol=5e-4, atol=5e-4,
        err_msg=f'{name} type={int(mjm.sensor_type[s])}')


def test_touch_fires_on_contact():
  """Foot on the floor: touch sensor reads positive normal force."""
  mjm, mjd, m, d = fixture(SENSOR_MODEL, nstep=200)
  import jax
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(250):
    d = step(d)
  touch_id = [s for s in range(mjm.nsensor)
              if mjm.sensor_type[s] == mujoco.mjtSensor.mjSENS_TOUCH][0]
  adr = mjm.sensor_adr[touch_id]
  assert float(d.sensordata[adr]) > 1.0  # weight on the foot


def test_energy_sensors():
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <body pos="0 0 1">
        <joint type="hinge" axis="0 1 0" stiffness="4" springref="0.3"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      </body>
    </worldbody>
    <sensor><e_potential/><e_kinetic/></sensor>
  </mujoco>
  """
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.4, qvel_noise=0.5)
  d = mjwt.forward(m, d)
  assert_close(d.sensordata, mjd.sensordata, 'energy sensors', tol=1e-4)


REF_FRAME = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.05 0.05 0.05" mass="1" contype="0"
            conaffinity="0"/>
      <site name="sa" pos="0.05 0 0" euler="10 20 0"/>
    </body>
    <body name="b" pos="0.4 0 1.2" euler="0 0 30">
      <freejoint/>
      <geom type="sphere" size="0.05" mass="0.5" contype="0"
            conaffinity="0"/>
      <site name="sb" pos="0 0.05 0"/>
    </body>
  </worldbody>
  <sensor>
    <framequat objtype="site" objname="sa" reftype="site" refname="sb"/>
    <framelinvel objtype="body" objname="a" reftype="site" refname="sb"/>
    <frameangvel objtype="site" objname="sa" reftype="body" refname="b"/>
    <framepos objtype="body" objname="a" reftype="site" refname="sb"/>
  </sensor>
</mujoco>
"""


def test_ref_frame_sensors():
  mjm, mjd, m, d = fixture(REF_FRAME, qpos_noise=0.2, qvel_noise=0.5)
  d = mjwt.forward(m, d)
  ours = np.asarray(d.sensordata)
  ref = mjd.sensordata
  # quaternion sign ambiguity: compare up to sign for the first 4 entries
  if ours[0] * ref[0] < 0:
    ours = ours.copy()
    ours[:4] = -ours[:4]
  np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


CAMPROJ = """
<mujoco>
  <worldbody>
    <body pos="0.4 0.1 1.2">
      <freejoint/>
      <geom type="sphere" size="0.05" mass="1" contype="0" conaffinity="0"/>
      <site name="target"/>
    </body>
    <camera name="cam" pos="0 -2 1" euler="80 0 10" fovy="50"
            resolution="320 240"/>
  </worldbody>
  <sensor><camprojection site="target" camera="cam"/></sensor>
</mujoco>
"""


def test_camprojection():
  mjm, mjd, m, d = fixture(CAMPROJ, qpos_noise=0.1)
  d = mjwt.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata,
                             rtol=1e-4, atol=0.02)


GEOMDIST = """
<mujoco>
  <worldbody>
    <body pos="0 0 0.5"><freejoint/>
      <geom name="g1" type="sphere" size="0.1" mass="1" contype="0"
            conaffinity="0"/></body>
    <body pos="0.35 0 0.5"><freejoint/>
      <geom name="g2" type="box" size="0.08 0.08 0.08" mass="1"
            contype="0" conaffinity="0"/></body>
  </worldbody>
  <sensor>
    <distance geom1="g1" geom2="g2" cutoff="1"/>
    <normal geom1="g1" geom2="g2" cutoff="1"/>
    <fromto geom1="g1" geom2="g2" cutoff="1"/>
  </sensor>
</mujoco>
"""


def test_geomdist_sensors():
  mjm, mjd, m, d = fixture(GEOMDIST, qpos_noise=0.05)
  d = mjwt.forward(m, d)
  ours = np.asarray(d.sensordata)
  ref = mjd.sensordata
  np.testing.assert_allclose(ours[0], ref[0], atol=2e-3)   # distance
  # normal direction (allow small angle error from MPR)
  n_o, n_r = ours[1:4], ref[1:4]
  assert n_o @ n_r > 0.98 * np.linalg.norm(n_o) * np.linalg.norm(n_r)
  np.testing.assert_allclose(ours[4:10], ref[4:10], atol=5e-3)  # fromto


INSIDESITE = """
<mujoco>
  <worldbody>
    <site name="zone" pos="0 0 0.5" type="box" size="0.3 0.3 0.3"/>
    <body pos="0 0 0.5"><freejoint/>
      <geom type="sphere" size="0.05" mass="1" contype="0"
            conaffinity="0"/>
      <site name="pt"/></body>
    <body pos="2 0 0.5"><freejoint/>
      <geom type="sphere" size="0.05" mass="1" contype="0"
            conaffinity="0"/>
      <site name="pt2"/></body>
  </worldbody>
  <sensor>
    <insidesite site="zone" objtype="site" objname="pt"/>
    <insidesite site="zone" objtype="site" objname="pt2"/>
  </sensor>
</mujoco>
"""


def test_insidesite():
  mjm, mjd, m, d = fixture(INSIDESITE)
  d = mjwt.forward(m, d)
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata)
  assert float(d.sensordata[0]) == 1.0 and float(d.sensordata[1]) == 0.0
