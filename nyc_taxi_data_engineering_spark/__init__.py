"""nyc_taxi_data_engineering_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL/data-platform project
``ravikanthreddyhv/nyc-taxi-data-engineering`` (medallion-zone ETL,
validation/quarantine splits, dimension enrichment, revenue aggregation,
SCD Type 2 master data, fuzzy-match MDM dedup, config-driven data-quality
rules, governance gates, lineage), plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Architecture: everything is a pure ``DataFrame -> DataFrame`` function
built on the DataFrame/SQL API so Catalyst + Tungsten pick the physical
strategy; Pandas UDFs only where built-ins genuinely can't express the
semantics (fuzzy scoring, embedding ops). No RDDs, no driver-side loops
on data paths.
"""

from nyc_taxi_data_engineering_spark.session import get_spark
from nyc_taxi_data_engineering_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]

__version__ = "0.1.0"
