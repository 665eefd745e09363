"""text_queries — populated in later slices."""
