"""Nightly benchmark harness: run the suite and append one JSONL record
per scene with commit + timestamp (reference: benchmarks/nightly.sh
appending to the gh-pages dashboard series)."""

import datetime
import json
import pathlib
import subprocess
import sys


def main(out_path='benchmarks/nightly.jsonl'):
  commit = subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                          capture_output=True, text=True).stdout.strip()
  stamp = datetime.datetime.now(datetime.timezone.utc).isoformat()
  proc = subprocess.run(
      [sys.executable, '-'],
      stdin=open(pathlib.Path(__file__).parent / 'run_all.py'),
      capture_output=True, text=True, cwd=pathlib.Path(__file__).parents[1])
  records = []
  for line in proc.stdout.splitlines():
    line = line.strip()
    if line.startswith('{'):
      rec = json.loads(line)
      rec.update(commit=commit, timestamp=stamp)
      records.append(rec)
  with open(out_path, 'a') as f:
    for rec in records:
      f.write(json.dumps(rec) + '\n')
  print(f'{len(records)} records appended to {out_path}')
  if not records:
    print(proc.stdout[-2000:], proc.stderr[-2000:])
    return 1
  return 0


if __name__ == '__main__':
  sys.exit(main())
