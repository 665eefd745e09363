"""similarity_queries — populated in later slices."""
