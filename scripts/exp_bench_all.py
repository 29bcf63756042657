"""Run all bench.py configs sequentially on the TPU (one process)."""
import sys

sys.path.insert(0, "/root/repo")
import json
import subprocess

for args in (["512"], ["64"], ["hs", "64"], ["launch", "16"], ["mpc"]):
    out = subprocess.run(
        [sys.executable, "/root/repo/bench.py", *args],
        capture_output=True, text=True, timeout=3000,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    print(args, line[-1] if line else out.stderr[-300:], flush=True)
