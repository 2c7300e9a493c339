"""Placeholder — filled in later phases."""
