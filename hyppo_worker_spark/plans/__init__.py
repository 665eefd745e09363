"""Plan inspection utilities: assertions about physical plans
(pushdown reached the scan, join went broadcast, codegen fused) used
by tests and the perf harness."""
