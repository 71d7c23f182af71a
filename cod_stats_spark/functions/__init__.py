"""Column-expression libraries — pure pyspark.sql.functions compositions.

Everything here returns Column objects (JVM-side, whole-stage-codegen
friendly); no Python UDFs.
"""

from cod_stats_spark.functions import text  # noqa: F401
