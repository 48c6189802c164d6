"""Beamforming (being built; see beamforming.py)."""
