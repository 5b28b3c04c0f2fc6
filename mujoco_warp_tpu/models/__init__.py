"""Benchmark scene assets (standard MJCF models)."""

import os

_DIR = os.path.dirname(__file__)


def path(name: str) -> str:
  return os.path.join(_DIR, name if name.endswith('.xml') else name + '.xml')


HUMANOID = path('humanoid')
THREE_HUMANOIDS = path('three_humanoids')
BOXES = path('boxes')
ARM = path('arm')
