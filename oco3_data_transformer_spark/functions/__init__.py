"""Column-expression library (JVM-side, whole-stage-codegen friendly).

Everything here composes built-in ``pyspark.sql.functions``; there are no
row-at-a-time Python UDFs on the hot path. Where a deterministic hash must
match an external oracle (DuckDB), the portable md5-prefix construction in
``hashing`` is used on both sides.
"""
