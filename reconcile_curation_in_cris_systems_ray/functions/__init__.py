"""Pure, vectorized scalar/batch functions (no Ray dependency)."""
