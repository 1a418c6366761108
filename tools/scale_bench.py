"""CPU-scaling benchmark — the engine-side replica of the reference's
horizontal-scaling experiment (``infra/scale_horizontal_runner.sh``
drops one worker per iteration, 6 → 1, on the same 1M-row batch2
workload; numbers in BASELINE.md: 43.3-62.8 s total, near-flat because
merge dominates and is shuffle-bound).

Here the axis is local executor threads (``local[N]``): each config
runs in a fresh subprocess so the JVM/session cannot carry state
between sizes. Prints one JSON line per config:
``{"cpus": N, "n_rows": ..., "load_s": ..., "merge_s": ...}``.

Usage: python tools/scale_bench.py [rows] [cpus ...]   (defaults:
1000000 at 4 8 16 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    rows = args[0] if args else 1_000_000
    cpus = args[1:] or [4, 8, 16, 32]
    for n in cpus:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "volume_bench.py"), str(rows)],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if line is None:
            print(
                json.dumps({"cpus": n, "error": proc.stderr.strip()[-400:]}),
                flush=True,
            )
            continue
        out = {"cpus": n, **json.loads(line)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
