"""mjSENS_CONTACT oracle tests (reference sensor.py:1750-2446)."""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt

from fixtures import assert_close

XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body name="b1" pos="0 0 0.095">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" mass="1.0"/>
    </body>
    <body name="b2" pos="0.5 0 0.07">
      <freejoint/>
      <geom name="box1" type="box" size="0.08 0.08 0.08" mass="0.5"/>
    </body>
  </worldbody>
  <sensor>
    <contact name="c_geom" geom1="ball" data="found force dist pos normal"
             num="2" reduce="mindist"/>
    <contact name="c_pair" body1="b1" geom2="floor" data="force"
             num="1" reduce="maxforce"/>
    <contact name="c_net" body1="b2" data="found force torque pos"
             num="1" reduce="netforce"/>
    <contact name="c_all" geom1="floor" data="found dist" num="4"/>
  </sensor>
</mujoco>
"""


def _settled(nstep=150):
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=16)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  mujoco.mj_forward(mjm, mjd)
  d = mjwt.forward(m, d)
  return mjm, mjd, m, d


def test_contact_sensor_oracle():
  mjm, mjd, m, d = _settled()
  sd = np.asarray(d.sensordata)
  ref = mjd.sensordata
  for s in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[s], mjm.sensor_dim[s]
    name = mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_SENSOR, s)
    a, b = sd[adr:adr + dim], ref[adr:adr + dim]
    # forces settle to ~m*g scale; tolerate f32 + trajectory divergence
    scale = max(1.0, np.abs(b).max())
    err = np.abs(a - b).max() / scale
    assert err < 2e-2, (name, a, b)


def test_contact_sensor_found_counts():
  mjm, mjd, m, d = _settled()
  # c_all: floor vs anything -> ball (1) + box (4) contacts = 5 found
  s = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_SENSOR, 'c_all')
  adr = mjm.sensor_adr[s]
  assert int(np.asarray(d.sensordata)[adr]) == int(mjd.sensordata[adr])
