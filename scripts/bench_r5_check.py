"""Round-5 bench re-verification wrapper (queued like any TPU job).

No inner timeout: a subprocess.run timeout would SIGKILL bench.py
mid-TPU-op and wedge the tunnel (CLAUDE.md environment rules); the
queue's per-job timeout stays the documented last resort."""
import subprocess
import sys

r = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo")
sys.exit(r.returncode)
