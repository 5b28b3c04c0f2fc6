"""End-to-end tests for the benchmark harness itself (utils/benchmark).

Round-4 lesson: the cloth suite run died on a harness bug (ctrl_noise
jnp.stack([]) at nu=0) because no passive scene had ever been run
through benchmark() — protocol code gets the same test discipline as
physics code (reference analogue: benchmark.py is exercised by every
nightly run, benchmarks/nightly.sh).
"""

import importlib

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import parallel

bm = importlib.import_module('mujoco_warp_tpu.utils.benchmark')

_ACTUATED = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body><joint name="j0" type="hinge"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
  <actuator><motor joint="j0" ctrlrange="-1 1" ctrllimited="true"/>
  </actuator>
</mujoco>
"""

_PASSIVE = """
<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <body><joint type="hinge"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.3 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.mark.parametrize('xml', [_ACTUATED, _PASSIVE],
                         ids=['actuated', 'passive_nu0'])
def test_benchmark_runs_end_to_end(xml):
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=4)
  batch = parallel.make_batch(m, d, 4)
  metrics = bm.benchmark(None, m, batch, nstep=5)
  assert metrics['nworld'] == 4
  assert metrics['steps_per_sec'] > 0
  assert metrics['converged_worlds'] == 4
  qpos = np.asarray(metrics['final'].qpos)
  assert np.isfinite(qpos).all()


def test_benchmark_replay_runs_end_to_end():
  mjm = mujoco.MjModel.from_xml_string(_ACTUATED)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=4)
  batch = parallel.make_batch(m, d, 4)
  traj = jnp.zeros((3, 1), jnp.float32)
  metrics = bm.benchmark_replay(m, batch, traj, nstep=5)
  assert metrics['steps_per_sec'] > 0
  assert np.isfinite(np.asarray(metrics['final'].qpos)).all()
