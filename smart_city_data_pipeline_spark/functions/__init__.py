"""Column-expression libraries — pure ``pyspark.sql.functions``
compositions (JVM-side, whole-stage-codegen friendly). No Python UDFs.
"""
