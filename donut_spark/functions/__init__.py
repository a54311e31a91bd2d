"""Arrow-vectorized pandas UDFs and higher-order-function expressions
wrapping the pure kernels in `donut_spark.core`."""
