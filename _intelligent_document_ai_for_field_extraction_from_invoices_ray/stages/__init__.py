"""Ray Data stage builders: map_batches fns and actor classes."""
