"""Placeholder — populated in a later wave."""
