"""Geom (SDF) plugin runtime: registry, attribute parsing, validation
envelope (reference parity: geom SDF plugins only — ref io.py:132-139
rejects body/actuator/sensor plugins; ref collision_sdf.py:234 user_sdf
is the user hook, here `register_sdf_plugin`)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import collision_sdf


TORUS_XML = """<mujoco>
  <extension><plugin plugin="mujoco.sdf.torus"><instance name="t">
    <config key="radius1" value="0.35"/><config key="radius2" value="0.15"/>
  </instance></plugin></extension>
  <asset><mesh name="tm"><plugin instance="t"/></mesh></asset>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.5"><freejoint/>
      <geom type="sdf" name="tg" mesh="tm"><plugin instance="t"/></geom>
    </body>
  </worldbody>
</mujoco>"""


def test_plugin_attr_parsing():
  mjm = mujoco.MjModel.from_xml_string(TORUS_XML)
  m = mjwt.put_model(mjm)
  assert m.geom_plugin[0] == ''
  assert m.geom_plugin[1] == 'mujoco.sdf.torus'
  attr = np.asarray(m.geom_plugin_attr[1])
  np.testing.assert_allclose(attr[:2], [0.35, 0.15], rtol=1e-6)
  assert attr.shape == (collision_sdf.NPLUGINATTR,)


def test_torus_sdf_values():
  # the registered torus distance matches the analytic formula
  attr = jnp.zeros(collision_sdf.NPLUGINATTR).at[0].set(0.35).at[1].set(0.15)
  fn = collision_sdf._SDF_PLUGINS['mujoco.sdf.torus']
  # point on the major circle: distance = -minor radius (deepest inside)
  assert abs(float(fn(jnp.array([0.35, 0.0, 0.0]), attr)) + 0.15) < 1e-6
  # center of the hole: distance = major - minor
  assert abs(float(fn(jnp.zeros(3), attr)) - 0.2) < 1e-6
  # gradients come from jax.grad and must be finite
  g = jax.grad(lambda p: fn(p, attr))(jnp.array([0.3, 0.1, 0.05]))
  assert np.isfinite(np.asarray(g)).all()


BOWL_XML = """<mujoco>
  <extension><plugin plugin="mujoco.sdf.bowl"><instance name="t"/></plugin></extension>
  <asset><mesh name="tm"><plugin instance="t"/></mesh></asset>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.5"><freejoint/>
      <geom type="sdf" name="tg" mesh="tm"><plugin instance="t"/></geom>
    </body>
  </worldbody>
</mujoco>"""


def test_unregistered_plugin_rejected():
  mjm = mujoco.MjModel.from_xml_string(BOWL_XML)
  with pytest.raises(NotImplementedError, match='registered'):
    mjwt.put_model(mjm)


def test_user_registered_plugin():
  # a user registration makes the same model loadable; mimic the torus
  def bowl(p, attr):  # placeholder distance: sphere of attr[1]
    return jnp.sqrt(jnp.sum(p * p) + 1e-12) - attr[1]

  collision_sdf.register_sdf_plugin('mujoco.sdf.bowl', bowl)
  try:
    mjm = mujoco.MjModel.from_xml_string(BOWL_XML)
    m = mjwt.put_model(mjm)
    assert m.geom_plugin[1] == 'mujoco.sdf.bowl'
  finally:
    del collision_sdf._SDF_PLUGINS['mujoco.sdf.bowl']


@pytest.mark.slow
def test_torus_drop_rests_at_minor_radius():
  """A torus dropped on a plane settles with its center one minor
  radius above the floor (the analogue of the reference's
  test_data/collision_sdf scenes, stepped instead of single-shot)."""
  mjm = mujoco.MjModel.from_xml_string(TORUS_XML)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  step = jax.jit(lambda d: mjwt.step(m, d))
  for _ in range(400):
    d = step(d)
  assert abs(float(d.qpos[2]) - 0.15) < 0.02
  assert int(d.ncon) > 0
