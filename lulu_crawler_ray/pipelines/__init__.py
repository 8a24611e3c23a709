"""Pipelines: the flagship crawl, the oracle crawler, and the
relational / text / ANN query surface for the driver harness."""
