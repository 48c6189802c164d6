"""Presentation layer (matplotlib templates)."""

from .plots import (
    general_matrix_plot,
    general_plot,
    general_plot_two_axes,
    general_subplots_line,
    show,
)
