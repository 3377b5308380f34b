"""Placeholder — filled in as the operator family is implemented."""
