"""Run the benchmark suite across all bundled scenes (the analogue of
the reference's benchmarks/run.sh over config.txt) and print one JSON
line per scene."""

import json
import time

import jax
import jax.numpy as jnp
import mujoco

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import models, parallel
from mujoco_warp_tpu.utils.benchmark import benchmark

CONFIGS = [
    # (name, path, nworld, nconmax, nstep)
    ('humanoid', models.HUMANOID, 8192, 16, 500),
    ('three_humanoids', models.THREE_HUMANOIDS, 2048, 48, 300),
    ('boxes', models.BOXES, 8192, 24, 500),
    ('arm7', models.ARM, 16384, 8, 500),
]


def main():
  for name, path, nworld, nconmax, nstep in CONFIGS:
    mjm = mujoco.MjModel.from_xml_path(path)
    m = mjwt.put_model(mjm)
    d = mjwt.make_data(m, nconmax=nconmax)
    batch = parallel.make_batch(m, d, nworld)
    batch = parallel.shard_batch(batch, parallel.make_mesh())
    metrics = benchmark(None, m, batch, nstep=nstep)
    print(json.dumps({
        'scene': name, 'nworld': nworld,
        'steps_per_sec': round(metrics['steps_per_sec'], 1),
        'step_time_us': round(metrics['step_time_us'], 1),
        'jit_time_s': round(metrics['jit_time'], 1),
        'converged_worlds': metrics['converged_worlds'],
        'ncon_mean': round(metrics['ncon_mean'], 2),
        'solver_niter_mean': round(metrics['solver_niter_mean'], 2),
    }))


if __name__ == '__main__':
  main()
