"""Guard: the package carries no unreferenced (dead) functions.

Runs `tools/dead_code_audit.py` — every `def` in the package must be
referenced by name somewhere in sources/tests/tools, be an adjudicated
reference-parity API (tools/dead_code_allowlist.txt), or be deleted.
This keeps the round-3 "uncalled reference transcription" class of
finding structurally impossible to reintroduce unnoticed.
"""

import os
import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_no_dead_functions():
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dead_code_audit.py")],
        capture_output=True,
        text=True,
        timeout=300,  # regex pass over the whole tree; slow under -n N
    )
    assert p.returncode == 0, f"dead-code audit failed:\n{p.stdout}"
