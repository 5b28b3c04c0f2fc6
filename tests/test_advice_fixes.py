"""Regression tests for round-1 advisor findings (ADVICE.md):

1. Spatial tendon [site, site, geom, site]: the straight segment between
   the first two sites must be included (C mj_tendon emits every
   inter-site segment).
2. Island labels: contacts/equalities with world/static bodies
   (treeid -1) must not merge trees.
3. contact_force on elliptic-cone models decodes direct forces, not the
   pyramid layout.
4. set_const recomputes body_invweight0 / acc0 / tendon_length0 to match
   C mj_setConst after mass edits.
"""

import dataclasses

import jax.numpy as jnp
import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import island as island_mod
from mujoco_warp_tpu import support

from fixtures import assert_close, fixture

TENDON_SSGS = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 1"/>
    <site name="a" pos="-0.4 0 0.5"/>
    <body pos="0 0 0.5">
      <joint name="h" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      <site name="b" pos="0.05 0 0.05"/>
      <geom name="wrap" type="cylinder" size="0.06" fromto="0.15 -0.05 0 0.15 0.05 0"
            contype="0" conaffinity="0"/>
      <site name="c" pos="0.3 0 -0.02"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t" stiffness="10" springlength="0.2">
      <site site="a"/>
      <site site="b"/>
      <geom geom="wrap"/>
      <site site="c"/>
    </spatial>
  </tendon>
</mujoco>
"""


def test_tendon_inter_site_segment():
  """[site a, site b, geom, site c]: segment a->b must contribute."""
  mjm, mjd, m, d = fixture(TENDON_SSGS, qpos_noise=0.2, seed=3)
  d = mjwt.fwd_position(m, d)
  assert_close(d.ten_length, mjd.ten_length, 'ten_length')
  assert_close(d.ten_J, mjd.ten_J.reshape(mjm.ntendon, mjm.nv), 'ten_J')


ISLAND_FLOOR = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 1"/>
    <body pos="0 0 0.08">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.3"/>
    </body>
    <body pos="2 0 0.08">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.3"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_island_static_no_merge():
  """Two separated spheres resting on the floor form separate islands."""
  mjm, mjd, m, d = fixture(ISLAND_FLOOR)
  d = mjwt.forward(m, d)
  labels = np.asarray(island_mod.island(m, d))
  # both trees touch the floor, but the floor couples nothing
  assert labels[0] != labels[1], labels


def test_contact_force_elliptic():
  """mj_contactForce parity on an elliptic-cone model."""
  from fixtures import SPHERES
  xml = SPHERES.replace('<option timestep="0.002"/>',
                        '<option timestep="0.002" cone="elliptic"/>')
  mjm, mjd, m, d = fixture(xml, nstep=200, seed=11)
  d = mjwt.forward(m, d)
  # match our contact slots to mjd contacts by geom pair
  ours = {}
  ncon = int(d.ncon)
  for i in range(ncon):
    g = tuple(int(x) for x in np.asarray(d.contact.geom[i]))
    ours[g] = i
  checked = 0
  for j in range(mjd.ncon):
    g = tuple(int(x) for x in mjd.contact.geom[j])
    if g not in ours:
      continue
    i = ours[g]
    ref = np.zeros(6)
    mujoco.mj_contactForce(mjm, mjd, j, ref)
    got = np.asarray(support.contact_force(m, d, jnp.asarray(i)))
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3,
                               err_msg=f'contact {g}')
    checked += 1
  assert checked >= 2, f'only matched {checked} contacts'


def test_set_const_invweights():
  """set_const after a mass edit matches C mj_setConst."""
  mjm, mjd, m, d = fixture(TENDON_SSGS)
  scale = 1.7
  mjm.body_mass[:] *= scale
  mjm.body_inertia[:] *= scale
  mujoco.mj_setConst(mjm, mjd)

  m2 = dataclasses.replace(m, body_mass=m.body_mass * scale,
                           body_inertia=m.body_inertia * scale)
  m2 = mjwt.set_const(m2)
  assert_close(m2.body_subtreemass, mjm.body_subtreemass, 'subtreemass')
  assert_close(m2.dof_invweight0, mjm.dof_invweight0, 'dof_invweight0',
               tol=1e-4)
  assert_close(m2.body_invweight0, mjm.body_invweight0, 'body_invweight0',
               tol=1e-4)
  assert_close(m2.tendon_invweight0, mjm.tendon_invweight0,
               'tendon_invweight0', tol=1e-4)
  assert_close(m2.tendon_length0, mjm.tendon_length0, 'tendon_length0')
  assert_close(m2.actuator_acc0, mjm.actuator_acc0, 'acc0', tol=1e-4)
  assert_close(m2.stat.meaninertia, mjm.stat.meaninertia, 'meaninertia',
               tol=1e-4)


def test_make_data_njmax_validation():
  """njmax below the static requirement is rejected, not ignored."""
  mjm, mjd, m, d = fixture(ISLAND_FLOOR)
  import pytest
  with pytest.raises(ValueError):
    mjwt.make_data(m, nconmax=8, njmax=1)
  # a generous njmax is accepted
  mjwt.make_data(m, nconmax=8, njmax=10_000)
