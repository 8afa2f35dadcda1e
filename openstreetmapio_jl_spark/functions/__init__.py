"""Scalar/column function library: text, geo, cells, hashing.

Everything here comes in (a) a pure-Python form used by fixture generation and
pandas-UDF kernels, and (b) where possible a Spark Column-expression form built from
``pyspark.sql.functions`` so the hot path stays JVM-side in whole-stage codegen.
"""
