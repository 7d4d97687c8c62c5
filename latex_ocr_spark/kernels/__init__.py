"""Pure-numpy compute kernels shared by the Spark UDF path and the
single-process oracle — sharing one implementation pins float32 accumulation
order, so Spark-vs-oracle equality tests exercise exactly the distribution
logic (SURVEY.md §7 'Determinism')."""
