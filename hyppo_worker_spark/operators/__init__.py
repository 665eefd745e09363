"""Composite DataFrame operators the built-in API lacks as one call:
deduplication (exact / MinHash-LSH / SimHash), similarity search,
as-of joins, top-k per group. Each is a DataFrame → DataFrame
transformation built from declarative ops so Catalyst keeps
optimizing through it."""
