"""Transforms (being built; see transforms.py)."""
