"""Pure-numpy compute kernels shared by the Spark UDF path and the
single-process oracle — sharing one implementation pins float32 accumulation
order, so Spark-vs-oracle equality tests exercise exactly the distribution
logic (SURVEY.md §7 'Determinism')."""

# Bump when any kernel's NUMERICS change (encoder, decoder, image ops, beam):
# the materialized oracle parquets (fixtures/oracle_store.py) embed this in
# their filenames, so a numerics change automatically invalidates stale
# ground truth instead of silently comparing against it.
KERNELS_VERSION = 3
