"""noaa_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the RJNunez/NOAA-ETL reference (batch weather-style ETL:
typed ingest, unit conversion, QC filtering, reshaping, dimension joins,
temporal aggregation, Parquet/CSV I/O) plus the LLM-data-pipeline layer
(dedup, similarity search, multimodal columns, text analysis), designed
for 100 TB scale per SURVEY.md.

Architecture: everything is declared through the DataFrame/SQL API so
Catalyst owns optimization (predicate pushdown, column pruning, join
selection, AQE). Python UDFs appear only where built-ins cannot express
the semantics, and then only as Arrow-batched pandas UDFs.

Provenance note: the reference checkout at /root/reference/ was empty at
survey time (SURVEY.md §0); capability surface derives from the driver
contract (__spark_entry__.py, BASELINE.json) and public NOAA/Spark
knowledge. No reference file:line citations exist because no reference
files exist.
"""

__version__ = "0.1.0"

from noaa_etl_spark.session import get_spark, configure_session
from noaa_etl_spark.io import load_table, TABLES

__all__ = ["get_spark", "configure_session", "load_table", "TABLES"]
