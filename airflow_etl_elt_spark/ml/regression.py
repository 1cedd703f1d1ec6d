"""ML operators: the reference's scikit-learn training tail as pyspark.ml.

Reference parity (SURVEY.md §2.7):
- extract + 70/30 seeded split         — utils.py:39-79 → randomSplit(seed=42)
- StandardScaler                       — utils.py:94,102,114
- PolynomialFeatures (deg 2-3)         — utils.py:95,103,115 → PolynomialExpansion
- LinearRegression                     — utils.py:96
- HistGradientBoostingRegressor        — utils.py:104 → GBTRegressor (closest;
  Spark's GBT is not histogram-based — documented approximation)
- BayesianRidge                        — utils.py:116 → ridge LinearRegression
  (L2 via regParam, elasticNetParam=0 — documented approximation)
- ParameterGrid                        — utils.py:129-130 → ParamGridBuilder
- random ≥1 model choice, seeded       — utils.py:135-144 → rng.sample
- R² train/test                        — utils.py:224-233 → RegressionEvaluator

Target mirrors the reference: predict ``alcohol`` from the other features
(utils.py:69 drops alcohol as X, uses it as y).

Scale: pyspark.ml estimators train distributed; the grid loop is
driver-orchestrated like the reference's mapped tasks. randomSplit is
probabilistic (sizes ~70/30, not exact) — SURVEY §7 hazard 1 applies.
"""

from __future__ import annotations

import random
from typing import Any

from pyspark.ml import Pipeline as MlPipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import PolynomialExpansion, StandardScaler, VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression
from pyspark.sql import DataFrame

from airflow_etl_elt_spark.ml.tracking import TrackingClient


def feature_target_split(df: DataFrame, target: str = "alcohol") -> tuple[DataFrame, DataFrame, list[str]]:
    """utils.py:39-79: numeric features minus id/quality/high_quality/target;
    70/30 split, seed 42."""
    exclude = {"id", "quality", "high_quality", target}
    feats = [c for c, t in df.dtypes if c not in exclude and t in ("double", "float", "int", "bigint")]
    train, test = df.randomSplit([0.7, 0.3], seed=42)
    return train, test, feats


def model_specs(feats: list[str], target: str) -> list[dict[str, Any]]:
    """The reference's three model families + their small grids
    (utils.py:94-130), as assembled pyspark.ml pipelines."""
    assembler = VectorAssembler(inputCols=feats, outputCol="raw_features")
    scaler = StandardScaler(
        inputCol="raw_features", outputCol="scaled", withMean=True, withStd=True
    )
    specs: list[dict[str, Any]] = []
    for degree in (2, 3):  # PolynomialFeatures grid (utils.py:99)
        poly = PolynomialExpansion(degree=degree, inputCol="scaled", outputCol="features")
        lr = LinearRegression(featuresCol="features", labelCol=target)
        specs.append(
            {
                "name": f"linear_poly{degree}",
                "pipeline": MlPipeline(stages=[assembler, scaler, poly, lr]),
            }
        )
    for rate in (0.05, 0.1):  # HistGBR learning-rate grid (utils.py:107-111)
        gbt = GBTRegressor(
            featuresCol="raw_features", labelCol=target, stepSize=rate, maxIter=20, seed=42
        )
        specs.append({"name": f"gbt_lr{rate}", "pipeline": MlPipeline(stages=[assembler, gbt])})
    # BayesianRidge → ridge LR approximation (documented above)
    ridge = LinearRegression(
        featuresCol="scaled", labelCol=target, regParam=0.1, elasticNetParam=0.0
    )
    specs.append({"name": "ridge", "pipeline": MlPipeline(stages=[assembler, scaler, ridge])})
    return specs


def choose_models(specs: list[dict[str, Any]], rng: random.Random) -> list[dict[str, Any]]:
    """utils.py:135-144: random non-empty subset, without replacement."""
    k = rng.randint(1, len(specs))
    return rng.sample(specs, k)


def train_wine_models(
    df: DataFrame,
    target: str = "alcohol",
    rng: random.Random | None = None,
    tracker: "TrackingClient | None" = None,
    experiment_name: str = "wine",
) -> list[dict[str, float]]:
    """Train the chosen models; return per-model train/test R²
    (utils.py:224-233 semantics, rounded to 6 like np.round(r2, 6)).

    With ``tracker`` set, each model trains inside a tracked run and is
    registered as ``wine-<name>`` — the reference's full MLflow round trip
    (utils.py:180-250): experiment get-or-create, start_run, param/metric/tag
    logging, register_model — and each result dict carries the same extra
    keys the reference returns (experiment_id, model_uri, run_url, ...).
    """
    train, test, feats = feature_target_split(df, target)
    evaluator = RegressionEvaluator(labelCol=target, predictionCol="prediction", metricName="r2")
    exp = (
        tracker.get_or_create_experiment(
            experiment_name, tags={"version": "v1", "priority": "P1"}
        )
        if tracker is not None
        else None
    )
    out: list[dict[str, float]] = []
    for spec in choose_models(model_specs(feats, target), rng or random.Random(42)):
        model = spec["pipeline"].fit(train)
        rec = {
            "name": spec["name"],
            "r2_train": round(evaluator.evaluate(model.transform(train)), 6),
            "r2_test": round(evaluator.evaluate(model.transform(test)), 6),
        }
        if tracker is not None and exp is not None:
            with tracker.start_run(exp.experiment_id) as run:
                run.log_params({"model_name": spec["name"], "target": target, "n_features": len(feats)})
                run.log_metrics({"r2_train": rec["r2_train"], "r2_test": rec["r2_test"]})
                run.set_tag("Training Info", f"Basic {spec['name']} model for wine data.")
                # second tag + experiment_url: reference utils.py:238-250 parity
                run.set_tag("wine_tag", f"Predict alcohol index with {spec['name']}")
                model_uri = f"runs:/{run.info.run_id}/model"
                mv = tracker.register_model(model_uri, f"wine-{spec['name']}")
                rec.update(
                    {
                        "experiment_id": exp.experiment_id,
                        "experiment_name": experiment_name,
                        "artifact_location": exp.artifact_location,
                        "run_id": run.info.run_id,
                        "model_uri": model_uri,
                        "model_version": mv.version,
                        "run_url": f"{tracker.root}/#/experiments/{exp.experiment_id}/runs/{run.info.run_id}",
                        "experiment_url": f"{tracker.root}/#/experiments/{exp.experiment_id}",
                    }
                )
        out.append(rec)
    return out
