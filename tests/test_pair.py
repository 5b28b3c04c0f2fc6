"""Explicit <pair> contact tests: bypass filters, override parameters."""

import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt

from fixtures import assert_close, fixture

PAIR = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 1"/>
    <body pos="0 0 0.095">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" mass="1"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <contact>
    <pair geom1="floor" geom2="ball" condim="4"
          friction="0.4 0.4 0.01 0.001 0.001" solref="0.01 1.2"
          solimp="0.8 0.9 0.002 0.5 2" margin="0.002"/>
  </contact>
</mujoco>
"""


def test_pair_bypasses_filters_and_params():
  """contype/conaffinity are 0 — only the explicit pair collides, with
  its own friction/solref/condim."""
  mjm, mjd, m, d = fixture(PAIR)
  mjd.qvel[:3] = [0.5, 0.0, 0.0]
  mujoco.mj_forward(mjm, mjd)
  import jax.numpy as jnp
  d = d.replace(qvel=jnp.asarray(mjd.qvel, jnp.float32))
  d = mjwt.forward(m, d)
  assert mjd.ncon == 1 and int(d.ncon) == 1
  assert_close(d.contact.dist[:1], mjd.contact.dist, 'pair dist', tol=1e-5)
  np.testing.assert_allclose(np.asarray(d.contact.friction[0]),
                             mjd.contact.friction[0], atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.contact.solref[0]),
                             mjd.contact.solref[0], atol=1e-6)
  assert int(d.contact.dim[0]) == 4
  assert_close(d.qacc, mjd.qacc, 'pair qacc', tol=2e-3)


def test_pair_trajectory():
  mjm, mjd, m, d = fixture(PAIR)
  import jax
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  np.testing.assert_allclose(q, mjd.qpos, atol=5e-3)
