"""Effects (being built; see effects.py)."""
