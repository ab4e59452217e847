"""Sweep DVIE_UPSHEAD_TILE on the full bench model (one process per
setting would recompile the world; instead re-jit with the env var set
before each build — the tile is read at trace time)."""
import json
import os
import subprocess
import sys

SETTINGS = ["8,32,1", "16,32,1", "16,64,2", "8,64,1", "16,64,4", "8,128,2"]

for s in SETTINGS:
    env = dict(os.environ, DVIE_UPSHEAD_TILE=s)
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, env=env, timeout=3600)
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    print(s, "->", line[-1] if line else f"FAILED rc={r.returncode}: "
          + r.stderr.strip()[-200:], flush=True)
