"""Public-surface parity regression test.

Runs the automated audit from tools/parity_audit.py: every public
module / class / method / function / enum of the reference package must
exist here with a call-compatible signature (see the audit for the
compatibility rules). Guards against the API surface drifting from the
reference as the framework evolves.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)


def test_full_public_surface_parity():
    from parity_audit import run_audit

    rows, problems = run_audit()
    assert len(rows) > 450, "audit unexpectedly covered too few symbols"
    assert not problems, "\n".join(problems)
