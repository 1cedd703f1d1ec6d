from airflow_etl_elt_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_csv_normalized,
    read_table,
)
from airflow_etl_elt_spark.sources.sinks import (  # noqa: F401
    insert_ignore_by_name,
    replace_table,
    write_partitioned,
)
