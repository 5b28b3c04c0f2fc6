"""Why is the scan benchmark slower per step than direct stepping?
Compare python-loop vs scan, with/without ctrl noise and donation."""

import time

import jax
import jax.numpy as jnp
import mujoco

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import models, parallel
from mujoco_warp_tpu.utils.benchmark import ctrl_noise

NWORLD = 8192


def main():
  mjm = mujoco.MjModel.from_xml_path(models.HUMANOID)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  batch = parallel.make_batch(m, d, NWORLD, qpos_noise=0.01)

  step = jax.jit(lambda b: mjwt.step_batched(m, b), donate_argnums=0)
  t0 = time.perf_counter()
  batch = step(batch)
  jax.block_until_ready(batch.qpos)
  print(f'direct step compile {time.perf_counter()-t0:.1f}s')
  for _ in range(20):
    batch = step(batch)
  jax.block_until_ready(batch.qpos)
  t0 = time.perf_counter()
  for _ in range(50):
    batch = step(batch)
  jax.block_until_ready(batch.qpos)
  dt = (time.perf_counter() - t0) / 50
  print(f'python-loop step (donated): {dt*1e3:.2f} ms '
        f'-> {NWORLD/dt:,.0f} steps/s')

  worldids = jnp.arange(NWORLD, dtype=jnp.int32)

  def one_step_noise(carry, _):
    d, i = carry
    noisy = jax.vmap(lambda c, w: ctrl_noise(m, c, w, i))(d.ctrl, worldids)
    d = mjwt.step_batched(m, d.replace(ctrl=noisy))
    return (d, i + 1), None

  def one_step_plain(carry, _):
    d, i = carry
    d = mjwt.step_batched(m, d)
    return (d, i + 1), None

  for name, body in (('plain', one_step_plain), ('noise', one_step_noise)):
    chunk = 20
    run = jax.jit(lambda b, i, body=body: jax.lax.scan(
        body, (b, i), length=chunk)[0], donate_argnums=0)
    t0 = time.perf_counter()
    out, i = run((batch, jnp.zeros((), jnp.int32)))
    jax.block_until_ready(out.qpos)
    print(f'scan[{name}] compile {time.perf_counter()-t0:.1f}s')
    state = (out, i)
    t0 = time.perf_counter()
    for _ in range(5):
      state = run(state)
      state = (state[0], state[1]) if isinstance(state, tuple) else state
    jax.block_until_ready(state[0].qpos)
    dt = (time.perf_counter() - t0) / (5 * chunk)
    print(f'scan[{name}] per step: {dt*1e3:.2f} ms '
          f'-> {NWORLD/dt:,.0f} steps/s')
    batch = state[0]


if __name__ == '__main__':
  main()
