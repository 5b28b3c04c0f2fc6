"""Oracle-differential tests for the primitive colliders (reference
strategy: collision_driver_test.py's parameterized geom-pair matrix)."""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt

from fixtures import assert_close, fixture


def _pair_xml(geom1: str, geom2: str, pos2: str, euler2: str = '0 0 0'):
  return f"""
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <body>
        <geom {geom1}/>
      </body>
      <body pos="{pos2}" euler="{euler2}">
        <freejoint/>
        <geom {geom2}/>
      </body>
    </worldbody>
  </mujoco>
  """


# (name, geom1, geom2, pos2, euler2): overlapping configurations
PAIRS = [
    ('plane_sphere', 'type="plane" size="2 2 1"', 'type="sphere" size="0.1" mass="1"', '0 0 0.08', '0 0 0'),
    ('plane_capsule', 'type="plane" size="2 2 1"', 'type="capsule" size="0.05 0.2" mass="1"', '0 0 0.045', '5 85 0'),
    ('plane_ellipsoid', 'type="plane" size="2 2 1"', 'type="ellipsoid" size="0.1 0.15 0.2" mass="1"', '0 0 0.17', '20 15 0'),
    ('plane_cylinder_flat', 'type="plane" size="2 2 1"', 'type="cylinder" size="0.1 0.15" mass="1"', '0 0 0.14', '0 0 0'),
    ('plane_cylinder_tilt', 'type="plane" size="2 2 1"', 'type="cylinder" size="0.1 0.15" mass="1"', '0 0 0.17', '40 0 0'),
    ('plane_cylinder_side', 'type="plane" size="2 2 1"', 'type="cylinder" size="0.1 0.15" mass="1"', '0 0 0.09', '90 0 0'),
    ('plane_box_flat', 'type="plane" size="2 2 1"', 'type="box" size="0.1 0.12 0.08" mass="1"', '0 0 0.07', '0 0 0'),
    ('plane_box_tilt', 'type="plane" size="2 2 1"', 'type="box" size="0.1 0.12 0.08" mass="1"', '0 0 0.12', '25 10 5'),
    ('sphere_sphere', 'type="sphere" size="0.15" pos="0 0 0.15"', 'type="sphere" size="0.1" mass="1"', '0.1 0.05 0.35', '0 0 0'),
    ('sphere_capsule', 'type="sphere" size="0.15" pos="0 0 0.15"', 'type="capsule" size="0.05 0.2" mass="1"', '0.05 0 0.32', '0 80 0'),
    ('sphere_cylinder_side', 'type="cylinder" size="0.1 0.2" pos="0 0 0.2"', 'type="sphere" size="0.08" mass="1"', '0.16 0 0.25', '0 0 0'),
    ('sphere_cylinder_cap', 'type="cylinder" size="0.1 0.2" pos="0 0 0.2"', 'type="sphere" size="0.08" mass="1"', '0.03 0.02 0.46', '0 0 0'),
    ('sphere_box_face', 'type="box" size="0.2 0.2 0.2" pos="0 0 0.2"', 'type="sphere" size="0.1" mass="1"', '0.05 0 0.48', '0 0 0'),
    ('sphere_box_edge', 'type="box" size="0.2 0.2 0.2" pos="0 0 0.2"', 'type="sphere" size="0.1" mass="1"', '0.26 0 0.45', '0 0 0'),
    ('capsule_capsule', 'type="capsule" size="0.05 0.2" pos="0 0 0.2" euler="90 0 0"', 'type="capsule" size="0.05 0.15" mass="1"', '0.02 0 0.28', '0 90 0'),
    ('capsule_box_face', 'type="box" size="0.2 0.2 0.1" pos="0 0 0.1"', 'type="capsule" size="0.05 0.12" mass="1"', '0 0 0.24', '0 90 0'),
    ('capsule_box_end', 'type="box" size="0.2 0.2 0.1" pos="0 0 0.1"', 'type="capsule" size="0.05 0.12" mass="1"', '0.1 0.05 0.3', '20 0 0'),
]


@pytest.mark.parametrize('name,g1,g2,pos2,euler2',
                         PAIRS, ids=[p[0] for p in PAIRS])
def test_pair_contacts(name, g1, g2, pos2, euler2):
  """Penetration depths of active contacts match C MuJoCo (tolerance is
  loose where manifolds legitimately differ, strict on deepest point)."""
  xml = _pair_xml(g1, g2, pos2, euler2)
  mjm, mjd, m, d = fixture(xml)
  d = mjwt.fwd_position(m, d)

  ncon_ours = int(d.ncon)
  dist_ours = np.sort(np.asarray(d.contact.dist)[:ncon_ours])
  dist_ref = np.sort(mjd.contact.dist)
  assert mjd.ncon > 0, 'oracle config must actually collide'
  assert ncon_ours > 0, f'{name}: no contacts found (ref has {mjd.ncon})'
  # deepest contact must agree closely
  np.testing.assert_allclose(dist_ours[0], dist_ref[0], atol=2e-3,
                             err_msg=f'{name} deepest dist')


@pytest.mark.parametrize('name,g1,g2,pos2,euler2',
                         PAIRS, ids=[p[0] for p in PAIRS])
def test_pair_dynamics(name, g1, g2, pos2, euler2):
  """qacc after the full forward pass tracks C MuJoCo."""
  xml = _pair_xml(g1, g2, pos2, euler2)
  mjm, mjd, m, d = fixture(xml)
  d = mjwt.forward(m, d)
  # contact-rich accelerations: compare with a scale-aware tolerance
  scale = max(1.0, np.abs(mjd.qacc).max())
  err = np.abs(np.asarray(d.qacc) - mjd.qacc).max() / scale
  assert err < 2e-2, f'{name}: relative qacc err {err:.2e}'


def test_box_stack_settles():
  """A box resting on a plane must settle (no explosion over 200 steps)."""
  xml = _pair_xml('type="plane" size="2 2 1"',
                  'type="box" size="0.1 0.12 0.08" mass="1"',
                  '0 0 0.0799', '0 0 0')
  mjm, mjd, m, d = fixture(xml)
  import jax
  step = jax.jit(lambda d: mjwt.step(m, d))
  for _ in range(200):
    d = step(d)
  assert not np.any(np.isnan(np.asarray(d.qpos)))
  assert abs(float(d.qpos[2]) - 0.08) < 0.01
  # orientation stays upright
  assert float(d.qpos[3]) > 0.99
