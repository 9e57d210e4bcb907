"""Dataset-stage building blocks (each a map_batches / groupby composition)."""
