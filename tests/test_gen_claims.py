"""Guard: README claims block must match the committed artifacts.

Round-2 VERDICT weak item 1: `gen_claims.py --check` crashed on the
aed_stream row schema and nothing ran it, so the README drifted a full
round.  This test makes staleness (or a renderer crash) a suite failure.

Note for developers: adding/removing tests changes the collected-test
count, which is itself a claim — rerun ``python benchmarks/gen_claims.py``
after changing the test suite.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_claims_check_passes():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "gen_claims.py"),
         "--check"],
        cwd=ROOT, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"gen_claims --check failed (rc={proc.returncode}).\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}\n"
        "If the README is stale, run: python benchmarks/gen_claims.py"
    )
