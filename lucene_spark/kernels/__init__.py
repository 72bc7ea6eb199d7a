"""Bit-exact numeric kernels. Everything here is pure numpy/pandas —
no Spark imports — so kernels are unit-testable and shippable to executors
via spark-submit --py-files."""
