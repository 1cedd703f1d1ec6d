"""airflow_etl_elt_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference ``ArrayPD/Airflow-ETL-ELT`` (an Airflow-orchestrated pandas/DuckDB/
Postgres ETL+ELT demo — see SURVEY.md), re-expressed Spark-first:

- relational operators as thin, composable functions over ``pyspark.sql.DataFrame``
  (lazy plans — Catalyst does pushdown/pruning/join-selection),
- workflow semantics (params, retry, branch, fan-out, dataset triggers) as a
  ~small pipeline runner (``plans.pipeline``),
- large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) as first-class modules.

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, the reference repo's observable behavior, and published literature.
"""

__version__ = "0.1.0"

from airflow_etl_elt_spark.session import get_session  # noqa: F401

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
