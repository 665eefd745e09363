"""pipeline_queries — populated in later slices."""
