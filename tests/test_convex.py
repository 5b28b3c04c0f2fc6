"""MPR convex narrowphase vs C MuJoCo (nativeccd) oracle
(reference collision_gjk_test.py strategy)."""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt

from fixtures import fixture

CUBE_MESH = """
  <asset>
    <mesh name="cube" vertex="-0.1 -0.1 -0.1  0.1 -0.1 -0.1
      0.1 0.1 -0.1  -0.1 0.1 -0.1  -0.1 -0.1 0.1  0.1 -0.1 0.1
      0.1 0.1 0.1  -0.1 0.1 0.1"/>
  </asset>
"""

WEDGE_MESH = """
  <asset>
    <mesh name="wedge" vertex="-0.1 -0.1 0  0.1 -0.1 0  0.1 0.1 0
      -0.1 0.1 0  0 0 0.15"/>
  </asset>
"""


def _xml(assets, geom1, geom2, pos2, euler2='0 0 0'):
  return f"""
  <mujoco>
    <option timestep="0.002"/>
    {assets}
    <worldbody>
      <body><geom {geom1}/></body>
      <body pos="{pos2}" euler="{euler2}"><freejoint/><geom {geom2}/></body>
    </worldbody>
  </mujoco>
  """


CASES = [
    ('cyl_box', '', 'type="box" size="0.2 0.2 0.1" pos="0 0 0.1"',
     'type="cylinder" size="0.06 0.1" mass="0.5"', '0 0 0.28', '5 3 0'),
    ('cyl_cyl', '', 'type="cylinder" size="0.1 0.15" pos="0 0 0.15"',
     'type="cylinder" size="0.08 0.1" mass="0.5"', '0.05 0 0.38', '15 0 0'),
    ('ell_box', '', 'type="box" size="0.2 0.2 0.1" pos="0 0 0.1"',
     'type="ellipsoid" size="0.08 0.06 0.1" mass="0.5"', '0.03 0 0.28',
     '10 20 0'),
    ('ell_ell', '', 'type="ellipsoid" size="0.1 0.12 0.15" pos="0 0 0.15"',
     'type="ellipsoid" size="0.08 0.06 0.1" mass="0.5"', '0.02 0.03 0.37',
     '0 25 10'),
    ('cap_cyl', '', 'type="cylinder" size="0.1 0.15" pos="0 0 0.15"',
     'type="capsule" size="0.04 0.1" mass="0.5"', '0.04 0 0.35', '0 80 0'),
    ('cap_ell', '', 'type="ellipsoid" size="0.1 0.1 0.14" pos="0 0 0.14"',
     'type="capsule" size="0.04 0.1" mass="0.5"', '0.02 0 0.31', '0 85 0'),
    ('mesh_plane', CUBE_MESH, 'type="plane" size="2 2 1"',
     'type="mesh" mesh="cube" mass="1"', '0 0 0.095', '0 0 0'),
    ('mesh_plane_tilt', CUBE_MESH, 'type="plane" size="2 2 1"',
     'type="mesh" mesh="cube" mass="1"', '0 0 0.15', '30 15 0'),
    ('mesh_box', CUBE_MESH, 'type="box" size="0.3 0.3 0.1" pos="0 0 0.1"',
     'type="mesh" mesh="cube" mass="1"', '0.02 0 0.29', '5 5 0'),
    ('mesh_sphere', WEDGE_MESH,
     'type="sphere" size="0.1" pos="0 0 0.1"',
     'type="mesh" mesh="wedge" mass="1"', '0 0 0.17', '0 0 0'),
]


@pytest.mark.parametrize('name,assets,g1,g2,pos2,euler2', CASES,
                         ids=[c[0] for c in CASES])
def test_convex_depth(name, assets, g1, g2, pos2, euler2):
  """Deepest penetration matches C MuJoCo's nativeccd within MPR's
  portal-approximation tolerance."""
  xml = _xml(assets, g1, g2, pos2, euler2)
  mjm, mjd, m, d = fixture(xml)
  assert mjd.ncon > 0, f'{name}: oracle must collide'
  d = mjwt.fwd_position(m, d)
  n = int(d.ncon)
  assert n > 0, f'{name}: no contacts (ref {mjd.ncon})'
  ours = np.sort(np.asarray(d.contact.dist)[:n])[0]
  ref = np.sort(mjd.contact.dist)[0]
  np.testing.assert_allclose(ours, ref, atol=4e-3,
                             err_msg=f'{name} deepest dist')


@pytest.mark.parametrize('name,assets,g1,g2,pos2,euler2', CASES,
                         ids=[c[0] for c in CASES])
def test_convex_normal(name, assets, g1, g2, pos2, euler2):
  """Contact normal of the deepest contact roughly matches the oracle."""
  xml = _xml(assets, g1, g2, pos2, euler2)
  mjm, mjd, m, d = fixture(xml)
  d = mjwt.fwd_position(m, d)
  n = int(d.ncon)
  i_ours = int(np.argmin(np.asarray(d.contact.dist)[:n]))
  i_ref = int(np.argmin(mjd.contact.dist))
  n_ours = np.asarray(d.contact.frame)[i_ours, 0]
  n_ref = mjd.contact.frame.reshape(-1, 3, 3)[i_ref, 0]
  cosang = abs(float(n_ours @ n_ref))
  assert cosang > 0.95, f'{name}: normal misaligned (cos {cosang:.3f})'


def test_mesh_settles_on_plane():
  xml = _xml(CUBE_MESH, 'type="plane" size="2 2 1"',
             'type="mesh" mesh="cube" mass="1"', '0 0 0.0999', '0 0 0')
  mjm, mjd, m, d = fixture(xml)
  import jax
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(200):
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  assert abs(q[2] - 0.1) < 0.01
  assert q[3] > 0.99  # stays upright


def test_margin_band_contact():
  """Convex pairs with positive margin produce contacts while separated
  within the margin band (dist in [0, margin))."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <body><geom type="cylinder" size="0.1 0.1" pos="0 0 0.1"
                  margin="0.02"/></body>
      <body pos="0 0 0.312"><freejoint/>
        <geom type="cylinder" size="0.08 0.1" mass="0.5" margin="0.02"/>
      </body>
    </worldbody>
  </mujoco>
  """
  mjm, mjd, m, d = fixture(xml)
  assert mjd.ncon > 0 and mjd.contact.dist.min() > 0  # separated, in band
  d = mjwt.fwd_position(m, d)
  n = int(d.ncon)
  assert n > 0, 'no margin-band contact found'
  ours = np.sort(np.asarray(d.contact.dist)[:n])[0]
  ref = np.sort(mjd.contact.dist)[0]
  np.testing.assert_allclose(ours, ref, atol=3e-3)


def test_separated_lateral_offset_no_contact():
  """Regression: a small convex body ABOVE a large flat one, laterally
  offset so the center axis v0 is nearly parallel to the separating
  plane. A flip-by-dot(n, v0) portal orientation walks the portal to
  the far face of the CSO and reports ~0.65 m fake penetration (seen
  on aloha mesh scenes); the winding-invariant MPR must report no
  contact (C MuJoCo: 0 contacts, separation ~ +0.126)."""
  xml = _xml(
      CUBE_MESH,
      'type="box" size="0.61 0.37 0.1" pos="0 0 -0.099"',
      'type="mesh" mesh="cube" mass="0.1"', '0 0.176 0.23',
      '30 0 90')
  mjm, mjd, m, d = fixture(xml)
  assert mjd.ncon == 0  # oracle: separated
  d = mjwt.fwd_position(m, d)
  n = int(d.ncon)
  dists = np.asarray(d.contact.dist)[:n]
  assert np.all(dists > 0), f'fake penetration: {dists}'


def test_separated_stack_sweep_no_contact():
  """Sweep a small box over a large table at +3 cm clearance: no
  position may produce a contact (MPR false-positive sweep)."""
  import jax
  for dx, dy in [(0.0, 0.0), (0.3, 0.0), (0.55, 0.3), (-0.5, -0.35),
                 (0.1, 0.36), (-0.6, 0.1)]:
    xml = _xml(
        '', 'type="box" size="0.61 0.37 0.1" pos="0 0 -0.099"',
        'type="cylinder" size="0.05 0.02" mass="0.1"',
        f'{dx} {dy} 0.051', '10 5 0')
    mjm, mjd, m, d = fixture(xml)
    assert mjd.ncon == 0, (dx, dy)
    d = mjwt.fwd_position(m, d)
    n = int(d.ncon)
    dists = np.asarray(d.contact.dist)[:n]
    assert np.all(dists > 0), (dx, dy, dists)


# ---------------------------------------------------------------------------
# Multi-contact manifolds (MULTICCD, on by default in MuJoCo >= 3.3).
# The reference implements contact-face polygon clipping
# (collision_convex.py:706-1267); ours is MPR + tangential tilt
# re-portals (collision_convex.mpr_multi). Oracle: C nativeccd.
# ---------------------------------------------------------------------------


def test_multiccd_box_mesh_manifold():
  """A mesh cube resting flat on a box face yields a >=4-point manifold
  whose depths match C and whose points span the patch both ways."""
  xml = _xml(CUBE_MESH, 'type="box" size="0.3 0.3 0.1" pos="0 0 0.1"',
             'type="mesh" mesh="cube" mass="1"', '0 0 0.295', '0 0 0')
  mjm, mjd, m, d = fixture(xml)
  assert mjd.ncon == 4  # C produces the 4 face corners
  d = mjwt.fwd_position(m, d)
  n = int(d.ncon)
  assert n >= 4, f'manifold too small: {n}'
  dist = np.asarray(d.contact.dist)[:n]
  pos = np.asarray(d.contact.pos)[:n]
  np.testing.assert_allclose(dist, np.full(n, mjd.contact.dist[0]),
                             atol=5e-4, err_msg='manifold depths')
  # patch is 0.2 x 0.2: points must span most of it in both tangents
  assert pos[:, 0].max() - pos[:, 0].min() > 0.1
  assert pos[:, 1].max() - pos[:, 1].min() > 0.1
  np.testing.assert_allclose(pos[:, 2], mjd.contact.pos[0, 2], atol=1e-3)


def test_multiccd_cylinder_box_face():
  """Cylinder standing end-on a box face: C gives a multi-point rim
  manifold; ours must produce >= 3 spread contacts at matching depth."""
  xml = _xml('', 'type="box" size="0.3 0.3 0.1" pos="0 0 0.1"',
             'type="cylinder" size="0.08 0.05" mass="0.5"',
             '0 0 0.248', '0 0 0')
  mjm, mjd, m, d = fixture(xml)
  assert mjd.ncon >= 3
  d = mjwt.fwd_position(m, d)
  n = int(d.ncon)
  assert n >= 3, f'rim manifold too small: {n}'
  dist = np.asarray(d.contact.dist)[:n]
  pos = np.asarray(d.contact.pos)[:n]
  np.testing.assert_allclose(dist, np.min(mjd.contact.dist), atol=1e-3)
  assert pos[:, 0].max() - pos[:, 0].min() > 0.08
  assert pos[:, 1].max() - pos[:, 1].min() > 0.08


def test_multiccd_smooth_pair_single_contact():
  """Sphere-on-mesh is point-like: the tilt re-portals must be rejected
  by the distinctness test, leaving one contact like C."""
  xml = _xml(CUBE_MESH, 'type="mesh" mesh="cube" mass="1" pos="0 0 0.1"',
             'type="sphere" size="0.08"', '0 0 0.275', '0 0 0')
  mjm, mjd, m, d = fixture(xml)
  assert mjd.ncon == 1
  d = mjwt.fwd_position(m, d)
  assert int(d.ncon) == 1, f'expected 1 contact, got {int(d.ncon)}'


def test_multiccd_disable_flag():
  """<flag multiccd="disable"/> falls back to single-contact MPR."""
  xml = f"""
  <mujoco>
    <option timestep="0.002"><flag multiccd="disable"/></option>
    {CUBE_MESH}
    <worldbody>
      <body><geom type="box" size="0.3 0.3 0.1" pos="0 0 0.1"/></body>
      <body pos="0 0 0.295"><freejoint/>
        <geom type="mesh" mesh="cube" mass="1"/></body>
    </worldbody>
  </mujoco>
  """
  mjm, mjd, m, d = fixture(xml)
  d = mjwt.fwd_position(m, d)
  assert int(d.ncon) == 1


@pytest.mark.slow
def test_multiccd_resting_stack_stable():
  """A mesh cube resting on a box face must not topple or creep over a
  1000-step unroll (single-point manifolds can't resist face torque —
  the regression this feature exists to prevent)."""
  import jax
  xml = _xml(CUBE_MESH, 'type="box" size="0.3 0.3 0.1" pos="0 0 0.1"',
             'type="mesh" mesh="cube" mass="1"', '0 0 0.2999', '0 0 0')
  mjm, mjd, m, d = fixture(xml)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(1000):
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  assert abs(q[0]) < 5e-3 and abs(q[1]) < 5e-3, f'crept: {q[:3]}'
  assert abs(q[2] - 0.3) < 5e-3, f'sank/rose: {q[2]}'
  assert q[3] > 0.9999, f'toppled: quat {q[3:7]}'
