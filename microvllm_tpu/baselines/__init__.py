"""A/B baseline engines (see `naive.py`)."""
