"""Placeholder — populated in a later slice."""
