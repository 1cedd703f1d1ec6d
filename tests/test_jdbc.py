"""JDBC source/sink over EMBEDDED Derby (ships in Spark's JVM — no server
needed), covering the reference's external-Postgres leg (VERDICT r1 #5:
`/root/reference/dags/etl_elt_wine.py:242-243` to_sql over ADBC, `:268-272`
pushdown read). The same wrappers take any JDBC URL (Postgres in prod);
Derby here proves the real JDBC write/read/pushdown path end-to-end.
"""

from __future__ import annotations

import pytest

from airflow_etl_elt_spark.sources.readers import read_jdbc
from airflow_etl_elt_spark.sources.sinks import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(name: str) -> str:
    return f"jdbc:derby:memory:{name};create=true"


@pytest.fixture()
def wine_like(spark):
    return spark.createDataFrame(
        [(1, 7, 10.5, 120.0), (2, 5, 9.1, 130.0), (3, 8, 11.2, 90.0), (4, 6, 9.9, 140.0)],
        "id int, quality int, alcohol double, total_sulfur_dioxide double",
    )


def test_jdbc_roundtrip_overwrite(spark, wine_like):
    url = _url("roundtrip")
    write_jdbc(wine_like, url, "wine_data_raw", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(spark, url, "wine_data_raw", driver=DERBY_DRIVER)
    assert back.count() == 4
    assert sorted(back.columns) == sorted(wine_like.columns)
    # overwrite really replaces (to_sql if_exists="replace" semantics)
    write_jdbc(wine_like.limit(2), url, "wine_data_raw", mode="overwrite", driver=DERBY_DRIVER)
    assert read_jdbc(spark, url, "wine_data_raw", driver=DERBY_DRIVER).count() == 2


def test_jdbc_pushdown_predicate_and_projection(spark, wine_like):
    url = _url("pushdown")
    write_jdbc(wine_like, url, "wine_data_raw", mode="overwrite", driver=DERBY_DRIVER)
    df = read_jdbc(
        spark,
        url,
        "wine_data_raw",
        predicate='"total_sulfur_dioxide" < 125',
        columns=('"quality"', '"alcohol"'),
        driver=DERBY_DRIVER,
    )
    # the ELT contract: the DATABASE runs the filter+projection — the Spark
    # relation's own schema is already the narrow result
    assert df.columns == ["quality", "alcohol"]
    rows = {(r["quality"], r["alcohol"]) for r in df.collect()}
    assert rows == {(7, 10.5), (8, 11.2)}
    # and the pushdown subquery is structural — visible in the scan node
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "spark_pushdown" in plan


def test_jdbc_append_mode(spark, wine_like):
    url = _url("append")
    write_jdbc(wine_like, url, "wine_data_raw", mode="overwrite", driver=DERBY_DRIVER)
    write_jdbc(wine_like, url, "wine_data_raw", mode="append", driver=DERBY_DRIVER)
    assert read_jdbc(spark, url, "wine_data_raw", driver=DERBY_DRIVER).count() == 8


def test_wine_elt_leg_over_jdbc(spark, tmp_path):
    """The reference's ELT leg (load raw → in-DB transform) through a real
    JDBC engine: write_jdbc replaces the raw table, elt_transform folds the
    WHERE + projection into the engine-side query."""
    from airflow_etl_elt_spark.plans.wine import elt_transform

    url = _url("wineelt")
    raw = spark.createDataFrame(
        [(1, 7, 10.5, 120.0), (2, 5, 9.1, 130.0), (3, 8, 11.2, 90.0)],
        "id int, quality int, alcohol double, total_sulfur_dioxide double",
    )
    write_jdbc(raw, url, "wine_data_raw", mode="overwrite", driver=DERBY_DRIVER)
    # Derby's embedded driver is auto-registered inside the JVM once the
    # write above ran; elt_transform's read path passes no driver option.
    out = elt_transform(spark, url)
    assert out.columns == ["quality", "alcohol"]
    assert out.count() == 2
