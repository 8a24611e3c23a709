"""Sources / sinks: testdata parquet, image-table IO (Lance seam), seeds."""
