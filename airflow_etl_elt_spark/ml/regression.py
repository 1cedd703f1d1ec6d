"""ML operators: the reference's scikit-learn training tail as pyspark.ml.

Reference parity (SURVEY.md §2.7):
- extract + 70/30 seeded split         — utils.py:39-79 → randomSplit(seed=42)
- StandardScaler                       — utils.py:94,102,114
- PolynomialFeatures (deg 2-3)         — utils.py:95,103,115 → PolynomialExpansion
- LinearRegression                     — utils.py:96
- HistGradientBoostingRegressor        — utils.py:104 → GBTRegressor with
  maxBins=255: Spark trees bin continuous features via quantile sketches
  and split over bin boundaries, i.e. histogram-based gradient boosting
  (sklearn's max_bins default is also 255); only leaf-growth order differs
- BayesianRidge                        — utils.py:116 → real MacKay-1992
  evidence-maximization Bayesian ridge (class BayesianRidge below): one
  distributed sufficient-statistics pass + driver-side d×d loop — the
  algorithm sklearn implements, not an L2 stand-in
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
        # maxBins=255 makes this literally histogram-based gradient
        # boosting: Spark trees discretize continuous features into
        # quantile-sketch bins and greedy-split over bin boundaries — the
        # same algorithm family as sklearn's HistGradientBoosting (whose
        # max_bins default is 255). The remaining difference is leaf-growth
        # order, not the histogram mechanism.
        gbt = GBTRegressor(
            featuresCol="raw_features",
            labelCol=target,
            stepSize=rate,
            maxIter=20,
            maxBins=255,
            seed=42,
        )
        specs.append({"name": f"gbt_lr{rate}", "pipeline": MlPipeline(stages=[assembler, gbt])})
    # Real BayesianRidge (MacKay evidence approximation over distributed
    # sufficient statistics — see the class above); standardization is
    # internal, so no assembler/scaler stages are needed.
    specs.append({"name": "bayesian_ridge", "pipeline": _BayesianRidgeSpec(feats, target)})
    return specs


class BayesianRidge:
    """Real Bayesian ridge regression (MacKay 1992 evidence approximation,
    the algorithm sklearn's ``BayesianRidge`` implements) — replacing the
    earlier ridge-LR stand-in for SURVEY §2.7 row 41.

    Spark-first shape: ONE distributed aggregation computes the sufficient
    statistics (n, Σx, Σy, ΣxᵢxⱼΣxᵢy, Σy²) as codegen sum expressions —
    d(d+3)/2+2 scalars for d features — then the evidence-maximization loop
    runs driver-side on the d×d Gram matrix (eigendecomposition once per
    fit, scalar updates per iteration: the iteration cost is independent of
    n, so 100 TB of rows changes nothing after the single pass). Features
    are standardized analytically from the same statistics (sklearn
    preprocessing parity: ddof=0), and the intercept comes from centering,
    like sklearn's ``fit_intercept=True``.

    ``fit`` returns a model whose ``transform`` adds ``prediction`` as a
    pure codegen column expression — scoring never touches Python.
    """

    def __init__(
        self,
        feature_cols: list[str],
        target: str,
        max_iter: int = 300,
        tol: float = 1e-3,
        alpha_1: float = 1e-6,
        alpha_2: float = 1e-6,
        lambda_1: float = 1e-6,
        lambda_2: float = 1e-6,
    ) -> None:
        self.feature_cols = list(feature_cols)
        self.target = target
        self.max_iter = max_iter
        self.tol = tol
        self.alpha_1, self.alpha_2 = alpha_1, alpha_2
        self.lambda_1, self.lambda_2 = lambda_1, lambda_2

    def fit(self, df: DataFrame) -> "BayesianRidgeModel":
        import numpy as np

        from pyspark.sql import functions as F

        feats, y = self.feature_cols, self.target
        d = len(feats)
        cols = [F.col(c).cast("double") for c in feats]
        yc = F.col(y).cast("double")
        aggs = [F.count(F.lit(1)).alias("n"), F.sum(yc).alias("sy"), F.sum(yc * yc).alias("syy")]
        aggs += [F.sum(c).alias(f"sx{i}") for i, c in enumerate(cols)]
        aggs += [F.sum(c * yc).alias(f"sxy{i}") for i, c in enumerate(cols)]
        aggs += [
            F.sum(cols[i] * cols[j]).alias(f"sxx{i}_{j}")
            for i in range(d)
            for j in range(i, d)
        ]
        r = df.agg(*aggs).first()

        n = float(r["n"])
        sx = np.array([r[f"sx{i}"] for i in range(d)])
        sxy = np.array([r[f"sxy{i}"] for i in range(d)])
        xtx = np.empty((d, d))
        for i in range(d):
            for j in range(i, d):
                xtx[i, j] = xtx[j, i] = r[f"sxx{i}_{j}"]
        mu = sx / n
        y_mean = float(r["sy"]) / n
        # centered+scaled moments, derived analytically (no second pass):
        # Xc^T Xc = X^T X - n·mu·mu^T ; Xc^T yc = X^T y - n·mu·y_mean
        ctc = xtx - n * np.outer(mu, mu)
        var = np.clip(np.diag(ctc) / n, 0.0, None)  # ddof=0, sklearn scaler parity
        s = np.sqrt(var)
        s[s == 0] = 1.0
        gram = ctc / np.outer(s, s)
        xty = (sxy - n * mu * y_mean) / s
        yty = float(r["syy"]) - n * y_mean * y_mean

        eigvals = np.clip(np.linalg.eigvalsh(gram), 0.0, None)
        # sklearn init: alpha = 1/var(y), lambda = 1
        alpha = 1.0 / (yty / n if yty > 0 else 1.0)
        lam = 1.0
        coef = np.zeros(d)
        for _ in range(self.max_iter):
            coef_old = coef
            coef = np.linalg.solve(gram + (lam / alpha) * np.eye(d), xty)
            gamma = float(np.sum(alpha * eigvals / (lam + alpha * eigvals)))
            sse = max(yty - 2 * coef @ xty + coef @ gram @ coef, 1e-32)
            lam = (gamma + 2 * self.lambda_1) / (float(coef @ coef) + 2 * self.lambda_2)
            alpha = (n - gamma + 2 * self.alpha_1) / (sse + 2 * self.alpha_2)
            if np.sum(np.abs(coef - coef_old)) < self.tol:
                break
        coef = np.linalg.solve(gram + (lam / alpha) * np.eye(d), xty)

        coef_raw = coef / s
        intercept = y_mean - float(coef_raw @ mu)
        return BayesianRidgeModel(
            feats, [float(c) for c in coef_raw], intercept, float(alpha), float(lam)
        )


class BayesianRidgeModel:
    def __init__(
        self,
        feature_cols: list[str],
        coef: list[float],
        intercept: float,
        alpha: float,
        lambda_: float,
    ) -> None:
        self.feature_cols = feature_cols
        self.coef = coef
        self.intercept = intercept
        self.alpha_ = alpha  # noise precision
        self.lambda_ = lambda_  # weight precision

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        pred = F.lit(self.intercept)
        for c, w in zip(self.feature_cols, self.coef):
            pred = pred + F.col(c).cast("double") * F.lit(w)
        return df.withColumn("prediction", pred)


class _BayesianRidgeSpec:
    """Duck-typed stand-in for a pyspark.ml Pipeline in model_specs: fit()
    ignores pre-assembled vector columns and works on the raw numeric
    feature columns directly."""

    def __init__(self, feature_cols: list[str], target: str) -> None:
        self._est = BayesianRidge(feature_cols, target)

    def fit(self, df: DataFrame) -> BayesianRidgeModel:
        return self._est.fit(df)


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
