"""Hfield collision oracle tests (reference's apollo hfield scenes)."""

import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt

from fixtures import fixture

HFIELD = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <hfield name="terrain" nrow="9" ncol="9" size="1 1 0.2 0.1"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="terrain"/>
    <body pos="0 0 0.5">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1"/>
    </body>
    <body pos="0.4 0.2 0.6">
      <freejoint/>
      <geom type="capsule" size="0.05 0.15" mass="0.5" euler="0 70 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _make(seed=0):
  np.random.seed(seed)
  mjm = mujoco.MjModel.from_xml_string(HFIELD)
  # deterministic bumpy terrain
  nr, nc = mjm.hfield_nrow[0], mjm.hfield_ncol[0]
  h = 0.5 + 0.5 * np.sin(np.linspace(0, 3, nr))[:, None] * np.cos(
      np.linspace(0, 4, nc))[None, :]
  mjm.hfield_data[:] = h.reshape(-1)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


def test_hfield_resting_depth():
  """Drop the sphere; both engines settle at similar height."""
  mjm, mjd, m, d = _make()
  import jax
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
  for _ in range(400):
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  # sphere z close to the C engine's resting height
  np.testing.assert_allclose(q[2], mjd.qpos[2], atol=0.02)
  # capsule also comes to rest on the terrain (not falling through)
  assert q[9] > 0.0
  assert abs(q[9] - mjd.qpos[9]) < 0.05


def test_hfield_contact_exists():
  mjm, mjd, m, d = _make()
  # place sphere just touching terrain under (0, 0)
  import jax.numpy as jnp
  # height at center of grid in world: base z in [0, sz]
  d = d.replace(qpos=d.qpos.at[2].set(0.15))
  mjd.qpos[2] = 0.15
  mujoco.mj_forward(mjm, mjd)
  d = mjwt.fwd_position(m, d)
  if mjd.ncon > 0:
    assert int(d.ncon) > 0
    ours = np.min(np.asarray(d.contact.dist)[:int(d.ncon)])
    ref = np.min(mjd.contact.dist)
    np.testing.assert_allclose(ours, ref, atol=3e-3)


BOX_HFIELD = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <hfield name="flat" nrow="9" ncol="9" size="1 1 0.2 0.1"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="flat"/>
    <body pos="0 0 0.35">
      <freejoint/>
      <geom type="box" size="0.1 0.08 0.06" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_box_on_hfield_rest():
  """Box settles on the heightfield at the C oracle's rest height
  (corner-sampled narrowphase)."""
  import jax
  import jax.numpy as jnp
  mjm = mujoco.MjModel.from_xml_string(BOX_HFIELD)
  # flat plateau at mid height
  mjm.hfield_data[:] = 0.5
  mjd = mujoco.MjData(mjm)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(250):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  z = float(d.qpos[2])
  assert np.isfinite(np.asarray(d.qpos)).all()
  assert abs(z - mjd.qpos[2]) < 5e-3, (z, mjd.qpos[2])
