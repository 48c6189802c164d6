"""Continuously validate the drop-in compatibility proof.

`tools/run_reference_tests.py` runs the REFERENCE package's own pytest
suite against this package (f64 mode). The full run is ~15 minutes
(docs/STATUS.md records the 191/191 score); this test keeps the alias
machinery and a representative slice green on every `pytest tests/` run.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TESTS = "/root/reference/tests"


@pytest.mark.skipif(
    not os.path.isdir(REF_TESTS), reason="reference tests not available"
)
@pytest.mark.slow
def test_reference_suite_slice():
    files = [
        f"{REF_TESTS}/test_generators.py",
        f"{REF_TESTS}/test_distances.py",
        f"{REF_TESTS}/test_tools.py",
    ]
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference_tests.py")]
        + files
        + ["-q"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert p.returncode == 0, (
        "reference-suite slice failed:\n" + p.stdout[-3000:]
    )
