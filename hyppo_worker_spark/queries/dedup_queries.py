"""dedup_queries — populated in later slices."""
