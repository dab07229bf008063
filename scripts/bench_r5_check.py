"""Round-5 bench re-verification wrapper (queued like any TPU job)."""
import subprocess, sys
r = subprocess.run([sys.executable, "bench.py"], cwd="/root/repo", timeout=1000)
sys.exit(r.returncode)
