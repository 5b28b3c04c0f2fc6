#!/usr/bin/env python3
"""Pallas kernel conformance lint (reference analogue:
contrib/kernel_analyzer — their Warp kernels get arg-order/aliasing
checks; these are the Mosaic/TPU hazard classes that actually broke
this repo's kernels in rounds 1-2):

PL001  lax.while_loop inside a kernel with a non-trivial carry.
       Mosaic legalizes SCALAR carries + ref mutation; big value
       carries fail scf.yield legalization or silently spill
       (memory: r2 solver kernel wedge).
PL002  lax.while_loop whose cond lambda mentions no iteration bound
       name (niter/iterations/cap/go) — an unbounded on-device loop
       can wedge the chip; convergence tests must be paired with an
       iteration cap.
PL003  jax.device_get / np.asarray on traced values inside a function
       that builds or runs under jit (heuristic: device_get calls in
       kernel-building modules outside put_model-time helpers). This
       class crashed BENCH_r02 at trace time.
PL004  strided middle-dim ref subscript `ref[:, j]` or `ref[:, a:b]`
       on a kernel ref parameter (names ending in `_ref`): leading-dim
       slices are contiguous, middle-dim strides measured ~100x slower
       in Mosaic.
PL005  float-dtype iota (`broadcasted_iota(jnp.float32, ...)` /
       `iota(float, ...)`): Mosaic's `tpu.iota` requires an integer
       dtype — interpret mode accepts it, the real compiler rejects it
       (r3: broke all three apollo configs). Build int iota + astype.

Usage: python tools/pallas_lint.py <dir-or-file> [...]
Exit code 1 if any finding."""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def _is_while_loop(call: ast.Call) -> bool:
  f = call.func
  return ((isinstance(f, ast.Attribute) and f.attr == 'while_loop') or
          (isinstance(f, ast.Name) and f.id == 'while_loop'))


def _names_in(node: ast.AST):
  for n in ast.walk(node):
    if isinstance(n, ast.Name):
      yield n.id
    elif isinstance(n, ast.Attribute):
      yield n.attr


_BOUND_HINTS = ('niter', 'iter', 'cap', 'go', 'count', 'step', 'k')


class Linter(ast.NodeVisitor):
  def __init__(self, path: str):
    self.path = path
    self.findings: list[tuple[str, int, str]] = []
    self._fn_stack: list[ast.FunctionDef] = []

  def _emit(self, code, node, msg):
    self.findings.append((code, node.lineno, msg))

  def _in_kernel(self) -> bool:
    """Inside a function that takes `*_ref` params (a Pallas kernel)."""
    for fn in self._fn_stack:
      args = [a.arg for a in fn.args.args]
      if any(a.endswith('_ref') or a.endswith('_scr') for a in args):
        return True
    return False

  def visit_FunctionDef(self, node):
    self._fn_stack.append(node)
    self.generic_visit(node)
    self._fn_stack.pop()

  visit_AsyncFunctionDef = visit_FunctionDef

  def visit_Call(self, node: ast.Call):
    if _is_while_loop(node) and self._in_kernel():
      # PL001: carry (3rd arg) should be a scalar-ish expression —
      # flag tuples/lists/dict carries
      if len(node.args) >= 3 and isinstance(
          node.args[2], (ast.Tuple, ast.List, ast.Dict)):
        self._emit('PL001', node,
                   'while_loop carry in a Pallas kernel is a composite; '
                   'Mosaic needs a scalar carry + ref mutation')
      # PL002: cond must reference an iteration bound
      if node.args:
        cond_names = set(_names_in(node.args[0]))
        if not any(any(h in n.lower() for h in _BOUND_HINTS)
                   for n in cond_names):
          self._emit('PL002', node,
                     'while_loop condition has no iteration bound '
                     '(unbounded on-device loops can wedge the chip)')
    f = node.func
    # PL005: float-dtype iota anywhere in kernel modules — Mosaic
    # requires integer tpu.iota (round-3 apollo breakage class)
    if (isinstance(f, ast.Attribute) and
        f.attr in ('broadcasted_iota', 'iota') and node.args):
      d = node.args[0]
      dname = (d.attr if isinstance(d, ast.Attribute) else
               d.id if isinstance(d, ast.Name) else '')
      if dname.startswith(('float', 'bfloat')) or dname == 'dt':
        self._emit('PL005', node,
                   f'{f.attr} with non-integer dtype {dname!r}: '
                   'Mosaic tpu.iota must be integer — use int32 iota '
                   '+ .astype(...)')
    # PL006: pallas_call whose enclosing function never consults a VMEM
    # estimate/gate — kernels that demand more than the chip's 128 MB
    # VMEM die in Mosaic or the compile helper (round-3 cloth nv=2706:
    # 3.7 GB windows); dispatchers must check probe.vmem_ok /
    # batch_linalg._vmem_gate (or annotate `pallas-lint: ok`)
    if isinstance(f, ast.Attribute) and f.attr == 'pallas_call':
      enclosing = self._fn_stack[-1] if self._fn_stack else None
      has_gate = enclosing is not None and any(
          'vmem' in n.lower() for n in _names_in(enclosing)
          if n not in ('VMEM',))
      if not has_gate:
        self._emit('PL006', node,
                   'pallas_call with no VMEM window estimate in the '
                   'dispatching function (probe.vmem_ok) — oversize '
                   'windows crash the Mosaic compile')
    if (isinstance(f, ast.Attribute) and f.attr == 'device_get' and
        self._fn_stack and
        not any(fn.name.startswith(('build', '_build', 'make', '_make'))
                and 'meta' in ast.dump(fn)
                for fn in self._fn_stack)):
      # allow in clearly put_model-time helpers; flag elsewhere
      fn_names = [fn.name for fn in self._fn_stack]
      if not any(n in ('pairs', 'build') for n in fn_names):
        self._emit('PL003', node,
                   f'jax.device_get inside {fn_names[-1]}: crashes at '
                   'trace time if reachable from jit (BENCH_r02 class)')
    self.generic_visit(node)

  def visit_Subscript(self, node: ast.Subscript):
    # PL004: ref[:, j] / ref[:, a:b] on *_ref names
    v = node.value
    if (isinstance(v, ast.Name) and
        (v.id.endswith('_ref') or v.id.endswith('_scr')) and
        isinstance(node.slice, ast.Tuple) and len(node.slice.elts) >= 2):
      first, second = node.slice.elts[0], node.slice.elts[1]
      full_first = (isinstance(first, ast.Slice) and first.lower is None
                    and first.upper is None)
      indexed_second = not isinstance(second, ast.Slice)
      if full_first and indexed_second and not isinstance(
          node.ctx, ast.Store):
        self._emit('PL004', node,
                   f'{v.id}[:, j] strided middle-dim read — '
                   'leading-dim slices are ~100x faster in Mosaic')
    self.generic_visit(node)


def lint_file(path: Path):
  src = path.read_text()
  tree = ast.parse(src, filename=str(path))
  lt = Linter(str(path))
  lt.visit(tree)
  lines = src.splitlines()
  # suppression: a `# pallas-lint: ok(<reason>)` comment on the line
  keep = []
  for code, line, msg in lt.findings:
    txt = lines[line - 1] if line - 1 < len(lines) else ''
    if 'pallas-lint: ok' in txt:
      continue
    keep.append((code, line, msg))
  return keep


def main(argv):
  targets = []
  for a in argv or ['mujoco_warp_tpu/pallas']:
    p = Path(a)
    targets += sorted(p.rglob('*.py')) if p.is_dir() else [p]
  nfind = 0
  for path in targets:
    for code, line, msg in lint_file(path):
      print(f'{path}:{line}: {code} {msg}')
      nfind += 1
  if nfind:
    print(f'{nfind} finding(s)')
  return 1 if nfind else 0


if __name__ == '__main__':
  sys.exit(main(sys.argv[1:]))
