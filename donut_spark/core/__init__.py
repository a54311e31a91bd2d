"""Pure-Python kernels. No Spark imports allowed in this subpackage —
everything here is a deterministic function of its arguments so it can be
unit-tested without a JVM and wrapped into Arrow-vectorized UDFs by
`donut_spark.functions`."""
