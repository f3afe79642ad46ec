"""Shared runner for scripts/*_smoke.py subprocess drills.

The multi-raylet ``ray.cluster_utils.Cluster`` smokes share one host
with the session-scoped single-node Ray fixture (and occasionally
external Ray sessions).  Under that contention a hard-killed raylet can
fail for purely environmental reasons — reproduced in round 4 (NOTES_
ROUND4 item 17: passes standalone, passes under pure-CPU load, fails
only alongside competing plasma stores).  One retry separates those
from real regressions: a code bug fails both attempts deterministically,
while an environmental hiccup passes on the clean second run.  The first
failure's stderr is printed so a retried pass is still visible in -rA
output / CI logs, never silently swallowed.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_smoke(script: str, timeout: int = 600, retries: int = 1):
    """Run scripts/<script> in a subprocess; retry environmental failures.

    Returns the successful CompletedProcess.  Raises AssertionError with
    the LAST attempt's stderr tail if every attempt fails.
    """
    path = os.path.join(REPO, "scripts", script)
    last = None
    for attempt in range(retries + 1):
        try:
            res = subprocess.run(
                [sys.executable, path],
                capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired as exc:
            # a wall-clock blowout on a loaded host is environmental in
            # exactly the same way a killed-raylet rc!=0 is — retry it
            last = exc
            print(
                f"[smoke] {script} attempt {attempt + 1} timed out "
                f"after {timeout}s; retrying once for environmental "
                f"contention.",
                file=sys.stderr,
            )
            continue
        if res.returncode == 0:
            return res
        last = res
        print(
            f"[smoke] {script} attempt {attempt + 1} failed "
            f"(rc={res.returncode}); retrying once for environmental "
            f"contention. stderr tail:\n{res.stderr[-2000:]}",
            file=sys.stderr,
        )
    if isinstance(last, subprocess.TimeoutExpired):
        raise AssertionError(
            f"{script} timed out {retries + 1}x at {timeout}s each "
            f"(deterministic hang, not environmental)"
        )
    raise AssertionError(
        f"{script} failed {retries + 1}x (deterministic, not "
        f"environmental):\n{last.stderr[-3000:]}"
    )
