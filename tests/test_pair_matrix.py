"""Geom-pair collision matrix: every supported type pair x a pose grid
vs the C MuJoCo oracle (reference collision_driver_test.py runs the
same kind of parameterized matrix, 1178 LoC of per-pair cases; here
one model per pair + qpos-driven poses so each pair costs one compile).

Checked per pose: penetration/no-contact agreement, deepest distance
within the narrowphase approximation envelope, and normal alignment of
the deepest contact.
"""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt

from fixtures import fixture

pytestmark = pytest.mark.slow  # 28 models x jit; excluded from -m 'not slow'

CUBE_MESH = """
  <asset>
    <mesh name="cube" vertex="-0.1 -0.1 -0.1  0.1 -0.1 -0.1
      0.1 0.1 -0.1  -0.1 0.1 -0.1  -0.1 -0.1 0.1  0.1 -0.1 0.1
      0.1 0.1 0.1  -0.1 0.1 0.1"/>
  </asset>
"""

# type -> (geom attrs, vertical half-extent at identity orientation)
SPECS = {
    'plane': ('type="plane" size="2 2 1"', 0.0),
    'sphere': ('type="sphere" size="0.1"', 0.1),
    'capsule': ('type="capsule" size="0.06 0.08"', 0.14),
    'ellipsoid': ('type="ellipsoid" size="0.08 0.1 0.12"', 0.12),
    'cylinder': ('type="cylinder" size="0.08 0.06"', 0.06),
    'box': ('type="box" size="0.1 0.12 0.08"', 0.08),
    'mesh': ('type="mesh" mesh="cube"', 0.1),
}
TYPES = list(SPECS)

# (overlap along z, euler of body2): + = penetrating, - = separated
POSES = [
    (0.01, '0 0 0'),
    (0.03, '0 0 0'),
    (0.015, '10 5 0'),
    (0.02, '0 0 35'),
    (-0.04, '0 0 0'),     # separated: no contact allowed
    (-0.02, '15 0 0'),
]

PAIRS = [(TYPES[i], TYPES[j]) for i in range(len(TYPES))
         for j in range(i, len(TYPES)) if not (TYPES[i] == 'plane'
                                               and TYPES[j] == 'plane')]


def _build(t1, t2):
  g1, _ = SPECS[t1]
  g2, _ = SPECS[t2]
  assets = CUBE_MESH if 'mesh' in (t1, t2) else ''
  return f"""
  <mujoco>
    <option timestep="0.002"/>
    {assets}
    <worldbody>
      <body><geom {g1}/></body>
      <body pos="0 0 1"><freejoint/><geom {g2} mass="0.5"/></body>
    </worldbody>
  </mujoco>
  """


@pytest.mark.parametrize('t1,t2', PAIRS, ids=[f'{a}-{b}' for a, b in PAIRS])
def test_pair_matrix(t1, t2):
  import jax
  xml = _build(t1, t2)
  mjm, mjd, m, d0 = fixture(xml)
  h1 = SPECS[t1][1]
  h2 = SPECS[t2][1]
  fwd = jax.jit(lambda dd: mjwt.fwd_position(m, dd))

  for overlap, euler in POSES:
    quat = np.zeros(4)
    mujoco.mju_euler2Quat(quat, np.radians(
        [float(x) for x in euler.split()]), 'xyz')
    # small lateral offset so degenerate exactly-axis-aligned configs
    # (ambiguous normals) don't dominate
    qpos = np.array([0.013, -0.009, h1 + h2 - overlap,
                     quat[0], quat[1], quat[2], quat[3]])
    mjd.qpos[:] = qpos
    mjd.qvel[:] = 0
    mujoco.mj_forward(mjm, mjd)

    d = d0.replace(qpos=jax.numpy.asarray(qpos, d0.qpos.dtype))
    d = fwd(d)
    n = int(d.ncon)
    dists = np.asarray(d.contact.dist)[:n] if n else np.zeros(0)

    ref_pen = mjd.ncon > 0 and float(mjd.contact.dist.min()) < 0
    our_pen = n > 0 and float(dists.min()) < 0
    tag = f'{t1}-{t2} overlap={overlap} euler={euler}'
    # a hair-thin contact may legitimately flip near dist ~ 0; only
    # enforce agreement when the oracle is decisive (|dist| > 2mm)
    if mjd.ncon > 0 and float(mjd.contact.dist.min()) < -2e-3:
      assert our_pen, f'{tag}: oracle penetrates, we do not'
    if mjd.ncon == 0 and overlap < -0.01:
      assert not our_pen, f'{tag}: fake penetration {dists}'

    if ref_pen and our_pen:
      ours = float(dists.min())
      ref = float(mjd.contact.dist.min())
      assert abs(ours - ref) < 6e-3, f'{tag}: depth {ours} vs C {ref}'
      i_ours = int(np.argmin(dists))
      i_ref = int(np.argmin(mjd.contact.dist))
      n_ours = np.asarray(d.contact.frame)[i_ours, 0]
      n_ref = mjd.contact.frame.reshape(-1, 3, 3)[i_ref, 0]
      cosang = abs(float(n_ours @ n_ref))
      assert cosang > 0.9, f'{tag}: normal cos {cosang:.3f}'
