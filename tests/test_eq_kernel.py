"""Equality rows (connect / weld / joint) in the contact megakernel vs
the XLA make_constraint path (reference constraint.py:125-215)."""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import mujoco

pytestmark = pytest.mark.slow  # interpret-mode: excluded from -m 'not slow'

EQ_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 1"/>
    <body name="a" pos="0 0 0.5">
      <joint type="free"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.2 0 0"/>
      <body name="b" pos="0.2 0 0">
        <joint name="h1" type="hinge" axis="0 1 0" range="-1 1"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.2 0 0"/>
      </body>
    </body>
    <body name="c" pos="0.6 0 0.5">
      <joint type="free"/>
      <geom type="box" size="0.05 0.05 0.05"/>
    </body>
    <body name="d" pos="-0.4 0 0.3">
      <joint name="h2" type="hinge" axis="0 1 0"/>
      <geom type="sphere" size="0.05"/>
    </body>
  </worldbody>
  <equality>
    <connect body1="b" body2="c" anchor="0.2 0 0"/>
    <weld body1="d" body2="a" relpose="0.4 0 0.2 1 0 0 0"/>
    <joint joint1="h1" joint2="h2" polycoef="0.05 0.8 0.1 0 0"/>
  </equality>
</mujoco>
"""


@pytest.fixture
def force_mega(monkeypatch):
  monkeypatch.setenv('MJWT_FORCE_MEGA', '1')


def test_eq_rows_match_xla(force_mega):
  import mujoco_warp_tpu as mjwt
  fwd = importlib.import_module('mujoco_warp_tpu.forward')
  from mujoco_warp_tpu.pallas import contact_kernels

  mjm = mujoco.MjModel.from_xml_string(EQ_XML)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  assert contact_kernels.supports(m, d)

  W = 2
  rng = np.random.default_rng(3)
  q0 = np.asarray(jax.device_get(d.qpos))
  qb = jnp.asarray(q0[None] + 0.05 * rng.standard_normal((W, q0.size)),
                   jnp.float32)
  vb = jnp.asarray(0.2 * rng.standard_normal((W, m.nv)), jnp.float32)
  batch = jax.vmap(lambda q, v: d.replace(qpos=q, qvel=v))(qb, vb)

  fb = jax.jit(lambda dd: fwd.forward_batched(m, dd))(batch)
  fr = jax.jit(jax.vmap(lambda dd: mjwt.forward(m, dd)))(batch)

  ne = int(np.asarray(fr.ne)[0])
  assert ne == 3 + 6 + 1  # connect + weld + joint rows
  for name, tol in (('efc_J', 1e-5), ('efc_D', 1e-2), ('efc_aref', 1e-2),
                    ('efc_pos', 1e-5), ('efc_vel', 1e-4)):
    a = np.asarray(jax.device_get(getattr(fb, name)))[:, :ne]
    b = np.asarray(jax.device_get(getattr(fr, name)))[:, :ne]
    scale = max(1.0, np.abs(b).max())
    np.testing.assert_allclose(a, b, atol=tol * scale, err_msg=name)
  np.testing.assert_array_equal(np.asarray(fb.ne), np.asarray(fr.ne))
