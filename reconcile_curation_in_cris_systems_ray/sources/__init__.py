"""Sources: readers + deterministic synthetic corpus generator."""
