"""Set-oriented operators of the CDC engine (all pyspark.sql DataFrame level)."""
