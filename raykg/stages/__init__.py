"""Ray Data stage wrappers: map_batches UDFs (stateless) + actor classes."""
