"""Per-stage TPU compile smoke: AOT-lower+compile every stage of the
real dispatched step path for each benchmark scene, in isolation, so a
Mosaic failure names the stage instead of killing a 5-minute jit of the
whole step (VERDICT r3 next-round item 5: real-Mosaic validation in the
loop; reference analogue: the nightly runs every config,
reference benchmarks/nightly.sh).

Usage:
  python tools/tpu_smoke.py humanoid apptronik_apollo_flat
  python tools/tpu_smoke.py --all            # every scene in config.txt
  python tools/tpu_smoke.py --all --step     # also run 3 real steps
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                'benchmarks'))


def probe_scene(name: str, cfg: dict, nworld: int, do_step: bool) -> dict:
  import jax
  import mujoco

  import mujoco_warp_tpu as mjwt
  import importlib
  # the package re-exports forward() the function, shadowing the module
  forward_mod = importlib.import_module('mujoco_warp_tpu.forward')
  from mujoco_warp_tpu import io as io_mod
  from mujoco_warp_tpu import parallel

  t0 = time.perf_counter()
  mjm = mujoco.MjModel.from_xml_path(cfg['mjcf'])
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=cfg['nconmax'])
  if mjm.nkey > 0:
    d = io_mod.reset_data(m, d, keyframe=0)
  batch = parallel.make_batch(m, d, nworld)
  res = dict(scene=name, nworld=nworld, load_s=round(
      time.perf_counter() - t0, 2), stages=[], ok=True)

  stages = forward_mod.batched_stages(m, batch, for_step=True)
  res['path'] = [n for n, _ in stages]
  for sname, fn in stages:
    t0 = time.perf_counter()
    print(f'[{name}] compiling {sname} ...', file=sys.stderr, flush=True)
    try:
      jax.jit(fn).lower(batch).compile()
      res['stages'].append(dict(stage=sname, ok=True, compile_s=round(
          time.perf_counter() - t0, 2)))
    except Exception as e:  # noqa: BLE001 - report, don't die
      res['ok'] = False
      res['stages'].append(dict(
          stage=sname, ok=False,
          compile_s=round(time.perf_counter() - t0, 2),
          error=f'{type(e).__name__}: {str(e)[:400]}'))
  if res['ok'] and do_step:
    t0 = time.perf_counter()
    try:
      step = jax.jit(lambda dd: forward_mod.step_batched(m, dd))
      out = step(batch)
      res['step_compile_s'] = round(time.perf_counter() - t0, 2)
      for _ in range(3):
        out = step(out)
      jax.block_until_ready(out.qpos)
      res['stepped'] = True
    except Exception as e:  # noqa: BLE001
      res['ok'] = False
      res['stepped'] = False
      res['error'] = f'{type(e).__name__}: {str(e)[:400]}'
  return res


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument('scenes', nargs='*')
  p.add_argument('--all', action='store_true')
  p.add_argument('--step', action='store_true',
                 help='also jit+run 3 full steps per scene')
  p.add_argument('--nworld', type=int, default=8)
  p.add_argument('--out', default=None)
  args = p.parse_args()

  from suite import parse_config
  cfgs = parse_config()
  names = list(cfgs) if args.all else args.scenes
  rc = 0
  lines = []
  for name in names:
    if name not in cfgs:
      print(f'unknown scene {name}; have {list(cfgs)}', file=sys.stderr)
      return 2
    try:
      res = probe_scene(name, cfgs[name], args.nworld, args.step)
    except Exception as e:  # noqa: BLE001 - load/dispatch failure
      traceback.print_exc()
      res = dict(scene=name, ok=False,
                 error=f'{type(e).__name__}: {str(e)[:400]}')
    line = json.dumps(res)
    print(line, flush=True)
    lines.append(line)
    if not res.get('ok'):
      rc = 1
  if args.out:
    with open(args.out, 'w') as f:
      f.write('\n'.join(lines) + '\n')
  return rc


if __name__ == '__main__':
  sys.exit(main())
