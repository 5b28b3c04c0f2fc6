"""Limit-sensor family oracle tests."""

import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt

from fixtures import fixture

XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-30 30"
             limited="true" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      <site name="end" pos="0.3 0 0"/>
    </body>
    <site name="anchor" pos="0 0 1.4"/>
  </worldbody>
  <tendon>
    <spatial name="t1" limited="true" range="0 0.45">
      <site site="anchor"/>
      <site site="end"/>
    </spatial>
  </tendon>
  <actuator><motor tendon="t1" gear="1"/></actuator>
  <sensor>
    <jointlimitpos joint="j1"/>
    <jointlimitvel joint="j1"/>
    <jointlimitfrc joint="j1"/>
    <tendonlimitpos tendon="t1"/>
    <tendonlimitvel tendon="t1"/>
    <tendonlimitfrc tendon="t1"/>
    <tendonactuatorfrc tendon="t1"/>
  </sensor>
</mujoco>
"""


def test_limit_sensors_active():
  """Push the joint past its limit; sensors match the oracle."""
  mjm, mjd, m, d = fixture(XML)
  mjd.qpos[0] = 0.6  # beyond 30deg = 0.52 rad
  mjd.qvel[0] = 1.0
  mjd.ctrl[0] = 0.5
  mujoco.mj_forward(mjm, mjd)
  d = d.replace(qpos=d.qpos.at[0].set(0.6), qvel=d.qvel.at[0].set(1.0),
                ctrl=d.ctrl.at[0].set(0.5))
  d = mjwt.forward(m, d)
  ours = np.asarray(d.sensordata)
  np.testing.assert_allclose(ours, mjd.sensordata, rtol=2e-3, atol=2e-3,
                             err_msg=f'{ours} vs {mjd.sensordata}')


def test_limit_sensors_inactive():
  mjm, mjd, m, d = fixture(XML)
  d = mjwt.forward(m, d)
  ours = np.asarray(d.sensordata)
  np.testing.assert_allclose(ours, mjd.sensordata, atol=1e-4)
