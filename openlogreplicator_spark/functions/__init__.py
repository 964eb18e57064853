"""Vectorized value decoders and scalar functions (SURVEY.md §2.7, F1–F12).

Every function here is either a native pyspark.sql.functions composition (JVM-side,
whole-stage-codegen'd) or an Arrow-batched pandas UDF — never row-at-a-time Python.
"""
