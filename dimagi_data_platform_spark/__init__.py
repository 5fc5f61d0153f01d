"""PySpark-native analytics engine with the query/data-processing
capabilities of dimagi/dimagi-data-platform, rebuilt Spark-first.

See SURVEY.md for the capability inventory; plans.queries for the
named query library; plans.oracle for the DuckDB parity SQL.
"""

from dimagi_data_platform_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
