"""Private-module compatibility shim.

The reference's own test suite imports the lattice/ladder coefficient
designer from this exact module path
(`/root/reference/tests/test_filterbanks.py:338`,
``from dsptoolbox.classes.lattice_ladder_filter import
_get_lattice_ladder_coefficients_iir``). The implementation lives in
`realtime/misc.py` here; this module re-exports it under the reference's
private names so the suite runs unmodified.
"""

from __future__ import annotations

from ..realtime.misc import (
    lattice_ladder_coefficients_iir,
    lattice_ladder_coefficients_iir_sos,
)


def _get_lattice_ladder_coefficients_iir(b, a):
    """Reference-named alias (`lattice_ladder_filter.py:400-446`)."""
    return lattice_ladder_coefficients_iir(b, a)


def _get_lattice_ladder_coefficients_iir_sos(sos):
    """Reference-named alias (`lattice_ladder_filter.py:449-482`)."""
    return lattice_ladder_coefficients_iir_sos(sos)
