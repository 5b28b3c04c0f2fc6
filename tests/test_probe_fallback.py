"""Probe machinery semantics (pallas/probe.py): kernel rejections are
memoized known-bad (fall back to XLA forever), infra errors (remote
compile helper 500s) are retried and never poison the on-disk memo —
the round-4 aloha_pot failure class.
"""

import json
import os

import pytest

from mujoco_warp_tpu.pallas import probe


@pytest.fixture
def fake_tpu(monkeypatch, tmp_path):
  """Make probe() exercise its real logic on CPU: pretend the backend
  is TPU and point the disk memo at a tmp dir."""
  import jax
  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  monkeypatch.setenv('MJWT_CACHE_DIR', str(tmp_path))
  monkeypatch.setattr(probe, '_MEMO', {})
  # force a fresh disk-memo read from the tmp dir
  if hasattr(probe, '_DISK'):
    monkeypatch.setattr(probe, '_DISK', None)
  monkeypatch.setenv('MJWT_PROBE_RETRIES', '2')
  return tmp_path


def _memo_path():
  return probe._memo_path() if hasattr(probe, '_memo_path') else (
      os.path.join(os.environ['MJWT_CACHE_DIR'], 'probe_memo.json'))


def test_kernel_rejection_memoized_bad(fake_tpu):
  calls = []

  def build():
    calls.append(1)
    raise ValueError('Mosaic failed to compile: unsupported op')

  assert probe.probe('reject_case', build) is False
  assert len(calls) == 1  # a real rejection is NOT retried
  # memoized: second probe consults the memo, never rebuilds
  assert probe.probe('reject_case', build) is False
  assert len(calls) == 1
  # and persisted known-bad on disk for future processes
  disk = json.load(open(os.path.join(str(fake_tpu), 'probe_memo.json')))
  assert any('reject_case' in k and v is False for k, v in disk.items())


def test_infra_error_retried_then_memoized_with_expiry(fake_tpu,
                                                       monkeypatch):
  monkeypatch.setattr(probe.time, 'sleep', lambda s: None)
  calls = []

  def build():
    calls.append(1)
    raise RuntimeError('remote_compile: HTTP 500: helper crashed')

  assert probe.probe('infra_case', build) is False
  assert len(calls) == 3  # 1 + MJWT_PROBE_RETRIES
  # a crash-on-every-retry IS recorded, but tagged infra with a
  # timestamp so it expires (the aloha_pot class: deterministic
  # kernel-triggered helper crash, 85 s wasted per process otherwise)
  path = os.path.join(str(fake_tpu), 'probe_memo.json')
  disk = json.load(open(path))
  entry = next(v for k, v in disk.items() if 'infra_case' in k)
  assert entry[0] is False and entry[2] == 'infra'

  # within the TTL: memo hit, no rebuild
  monkeypatch.setattr(probe, '_MEMO', {})
  monkeypatch.setattr(probe, '_DISK', None)
  assert probe.probe('infra_case', build) is False
  assert len(calls) == 3

  # after the TTL: entry dropped, probe runs again
  monkeypatch.setattr(probe, '_MEMO', {})
  monkeypatch.setattr(probe, '_DISK', None)
  monkeypatch.setenv('MJWT_PROBE_INFRA_TTL', '0')
  assert probe.probe('infra_case', build) is False
  assert len(calls) == 6


def test_success_memoized_good(fake_tpu):
  calls = []
  assert probe.probe('ok_case', lambda: calls.append(1)) is True
  assert probe.probe('ok_case', lambda: calls.append(1)) is True
  assert len(calls) == 1
  disk = json.load(open(os.path.join(str(fake_tpu), 'probe_memo.json')))
  assert any('ok_case' in k and v is True for k, v in disk.items())


def test_infra_then_success(fake_tpu, monkeypatch):
  """A transient 500 on the first attempt must not stop a later attempt
  in the same process from succeeding."""
  monkeypatch.setattr(probe.time, 'sleep', lambda s: None)
  state = {'n': 0}

  def build():
    state['n'] += 1
    if state['n'] == 1:
      raise RuntimeError('UNAVAILABLE: Socket closed')

  assert probe.probe('flaky_case', build) is True
  assert state['n'] == 2
