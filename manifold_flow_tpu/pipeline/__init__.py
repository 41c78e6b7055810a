"""Subpackage (populated incrementally)."""
