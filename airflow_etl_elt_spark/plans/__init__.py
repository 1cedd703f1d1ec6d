from airflow_etl_elt_spark.plans.pipeline import Pipeline, Step, StepResult  # noqa: F401
