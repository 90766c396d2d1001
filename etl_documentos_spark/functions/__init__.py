"""Scalar / text / hashing function library (SURVEY.md §2.8 parity).

Every function here is a pyspark.sql Column expression builder (JVM-side,
whole-stage-codegen'd) — no per-row Python. The few that genuinely need
Python (unicode accent-strip, check-digit math) are vectorized pandas UDFs.
"""
