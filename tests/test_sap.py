"""Large-scene broadphase (collision_sap) tests: equivalence with the
static NXN driver, kitchen-scale smoke, overflow observability
(reference SAP role: collision_driver.py:554-643, io.py:349-354)."""

import os

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt


def _pile_xml(nbodies=40, seed=0):
  rng = np.random.default_rng(seed)
  geoms = []
  for _ in range(nbodies):
    p = rng.uniform(-0.3, 0.3, 3)
    p[2] = rng.uniform(0.05, 0.5)
    kind = rng.choice(['box', 'sphere', 'capsule', 'cylinder'])
    size = {'box': '0.05 0.04 0.03', 'sphere': '0.04',
            'capsule': '0.03 0.04', 'cylinder': '0.04 0.03'}[kind]
    geoms.append(f'<body pos="{p[0]} {p[1]} {p[2]}"><freejoint/>'
                 f'<geom type="{kind}" size="{size}"/></body>')
  return (f'<mujoco><worldbody><geom type="plane" size="5 5 1"/>'
          f'{"".join(geoms)}</worldbody></mujoco>')


def _contacts(m, d):
  ncon = int(d.ncon)
  geom = np.asarray(d.contact.geom)[:ncon]
  dist = np.asarray(d.contact.dist)[:ncon]
  pos = np.asarray(d.contact.pos)[:ncon]
  return sorted((tuple(geom[i]), round(float(dist[i]), 5),
                 tuple(np.round(pos[i], 4))) for i in range(ncon))


@pytest.mark.slow
def test_sap_matches_nxn():
  """Forcing the pair-array driver on a settled pile produces the
  identical contact set to the static NXN driver."""
  mjm = mujoco.MjModel.from_xml_string(_pile_xml())
  mjd = mujoco.MjData(mjm)
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
  qpos = jnp.asarray(np.asarray(mjd.qpos), jnp.float32)

  def run(threshold):
    os.environ['MJWT_SAP_THRESHOLD'] = str(threshold)
    try:
      m = mjwt.put_model(mjm)
      d = mjwt.make_data(m, nconmax=256)
      d = d.replace(qpos=qpos)
      return bool(m.sap_meta), _contacts(m, mjwt.fwd_position(m, d))
    finally:
      del os.environ['MJWT_SAP_THRESHOLD']

  sap_off, ref = run(10**9)
  sap_on, got = run(1)
  assert not sap_off and sap_on
  assert ref == got


def test_sap_explicit_pair_params():
  """Explicit <pair> overrides flow through the dynamic param path."""
  xml = """
  <mujoco>
    <worldbody>
      <geom name="floor" type="plane" size="3 3 1"/>
      <body pos="0 0 0.04"><freejoint/>
        <geom name="ball" type="sphere" size="0.05"/></body>
    </worldbody>
    <contact>
      <pair geom1="floor" geom2="ball" friction="0.77 0.77 0.005 1e-4 1e-4"
            margin="0.02" solref="0.05 2"/>
    </contact>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  os.environ['MJWT_SAP_THRESHOLD'] = '1'
  try:
    m = mjwt.put_model(mjm)
    assert m.sap_meta
    d = mjwt.make_data(m, nconmax=8)
    d = mjwt.fwd_position(m, d)
  finally:
    del os.environ['MJWT_SAP_THRESHOLD']
  assert int(d.ncon) == 1
  np.testing.assert_allclose(np.asarray(d.contact.friction[0, 0]), 0.77,
                             rtol=1e-6)
  np.testing.assert_allclose(np.asarray(d.contact.solref[0]), [0.05, 2],
                             rtol=1e-6)
  np.testing.assert_allclose(np.asarray(d.contact.includemargin[0]), 0.02,
                             atol=1e-7)


@pytest.mark.slow
def test_kitchen_scene():
  """The kitchen scene (1608 geoms, ~236k admissible pairs) builds,
  collides, and matches C MuJoCo's contact pairs up to degenerate
  exactly-touching panels (dist == -0.0 tie-breaks)."""
  path = os.path.join(os.path.dirname(__file__), '..', 'benchmarks',
                      'scenes', 'kitchen', 'kitchen.xml')
  if not os.path.exists(path):
    pytest.skip('kitchen scene not present')
  mjm = mujoco.MjModel.from_xml_path(path)
  m = mjwt.put_model(mjm)
  assert m.sap_meta, 'kitchen must select the large-scene broadphase'
  d = mjwt.make_data(m, nconmax=1536)
  d = jax.jit(lambda dd: mjwt.fwd_position(m, dd))(d)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  cpairs = {}
  for i in range(mjd.ncon):
    g = tuple(sorted(mjd.contact[i].geom))
    cpairs.setdefault(g, []).append(float(mjd.contact[i].dist))
  ncon = int(d.ncon)
  geom = np.asarray(d.contact.geom)[:ncon]
  opairs = set(tuple(sorted(geom[i])) for i in range(ncon))
  # every C pair with real penetration must be found
  real = {g for g, ds in cpairs.items() if min(ds) < -1e-9}
  missing = real - opairs
  assert not missing, f'missing penetrating pairs: {sorted(missing)[:5]}'
