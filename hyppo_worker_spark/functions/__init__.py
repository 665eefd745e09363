"""Scalar/array function library: text analysis, hashing/fingerprints,
vector math. All built as Catalyst column expressions (JVM-side,
whole-stage codegen) — no Python UDFs in any hot path."""
