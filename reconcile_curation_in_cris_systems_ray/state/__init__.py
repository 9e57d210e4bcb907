"""Checkpoint / lineage manifest layer."""
