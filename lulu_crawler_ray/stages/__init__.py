"""map_batches stage functions and callable (actor-pool) classes."""
