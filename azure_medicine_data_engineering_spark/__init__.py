"""azure_medicine_data_engineering_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and data-processing
capabilities of the reference repo ``jakubMitura14/Azure-Medicine-Data-Engineering``
(an orchestrated medical ETL + analytics pipeline on Databricks Spark), generalized
into a reusable engine:

- ingestion with schema inference + declarative repair (``operators.cleaning``)
- data-quality / constraint checking as one-pass conditional aggregation
  (``operators.quality``)
- categorized summaries — the reference's signature grouping-sets-style operator
  (``operators.summarize``)
- a managed table catalog with metadata (``sources.catalog``)
- statistics (permutation tests, BH/SABHA FDR, Fisher exact) and mining
  (FPGrowth association rules) (``functions.stats``, ``functions.mining``)
- large-scale training-data pipeline operators: dedup, similarity search,
  text analysis, multimodal columns (``operators.dedup``, ``operators.similarity``,
  ``operators.text``, ``operators.multimodal``)
- Structured Streaming windows/watermarks over event streams (``streaming``)

Design principles (100 TB-scale first):

- DataFrame/SQL API only; Catalyst/Tungsten pick physical strategies.
- No per-column jobs: quality checks are single-pass conditional aggregations.
- No single-partition windows: grand totals use partial+final ``agg``.
- Broadcast small dimensions; AQE on for skew and partition coalescing.
- Python UDFs only where built-ins cannot express semantics, and then
  Arrow-batched (``pandas_udf`` / ``applyInPandas``), never row-at-a-time.
"""

from azure_medicine_data_engineering_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
