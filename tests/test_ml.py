"""ML tail (SURVEY.md §2.7): seeded model choice, pipeline training, R²."""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def wine_like(spark):
    import math

    rows = []
    rng = random.Random(3)
    for i in range(400):
        x1, x2, x3 = rng.uniform(0, 10), rng.uniform(0, 5), rng.uniform(1, 4)
        alcohol = 8 + 0.5 * x1 - 0.3 * x2 + 0.1 * x3 + rng.gauss(0, 0.2)
        rows.append((i, x1, x2, x3, alcohol, rng.randint(3, 9)))
    return spark.createDataFrame(
        rows, "id bigint, f1 double, f2 double, f3 double, alcohol double, quality int"
    )


def test_choose_models_seeded(spark):
    from airflow_etl_elt_spark.ml.regression import choose_models, model_specs

    specs = model_specs(["f1"], "alcohol")
    a = [s["name"] for s in choose_models(specs, random.Random(42))]
    b = [s["name"] for s in choose_models(specs, random.Random(42))]
    assert a == b and len(a) >= 1  # ≥1 model, deterministic under a pinned rng


def test_feature_target_split_excludes_meta(wine_like):
    from airflow_etl_elt_spark.ml.regression import feature_target_split

    train, test, feats = feature_target_split(wine_like)
    assert set(feats) == {"f1", "f2", "f3"}  # id/quality/target excluded
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 400
    assert 0.55 < n_train / 400 < 0.85  # ~70/30, probabilistic split


def test_train_linear_recovers_signal(wine_like):
    from airflow_etl_elt_spark.ml.regression import model_specs
    from pyspark.ml.evaluation import RegressionEvaluator

    spec = next(
        s for s in model_specs(["f1", "f2", "f3"], "alcohol") if s["name"] == "bayesian_ridge"
    )
    train, test = wine_like.randomSplit([0.7, 0.3], seed=42)
    model = spec["pipeline"].fit(train)
    r2 = RegressionEvaluator(labelCol="alcohol", metricName="r2").evaluate(model.transform(test))
    assert r2 > 0.9  # linear data → the Bayesian ridge recovers it


def test_bayesian_ridge_matches_local_reference(wine_like):
    """The distributed sufficient-statistics fit must agree with the same
    MacKay evidence-maximization algorithm run directly on locally collected
    arrays — validating the one-pass moment aggregation and the analytic
    centering/scaling, the two pieces Spark adds."""
    import numpy as np

    from airflow_etl_elt_spark.ml.regression import BayesianRidge

    feats = ["f1", "f2", "f3"]
    est = BayesianRidge(feats, "alcohol")
    model = est.fit(wine_like)

    rows = wine_like.select(*feats, "alcohol").collect()
    X = np.array([[r[c] for c in feats] for r in rows], dtype=float)
    y = np.array([r["alcohol"] for r in rows], dtype=float)
    n, d = X.shape
    mu, y_mean = X.mean(axis=0), y.mean()
    s = X.std(axis=0)
    s[s == 0] = 1.0
    Xs, yc = (X - mu) / s, y - y_mean
    gram, xty, yty = Xs.T @ Xs, Xs.T @ yc, float(yc @ yc)
    eig = np.clip(np.linalg.eigvalsh(gram), 0.0, None)
    alpha, lam, coef = 1.0 / (yty / n), 1.0, np.zeros(d)
    for _ in range(300):
        old = coef
        coef = np.linalg.solve(gram + (lam / alpha) * np.eye(d), xty)
        gamma = float(np.sum(alpha * eig / (lam + alpha * eig)))
        sse = max(yty - 2 * coef @ xty + coef @ gram @ coef, 1e-32)
        lam = (gamma + 2e-6) / (float(coef @ coef) + 2e-6)
        alpha = (n - gamma + 2e-6) / (sse + 2e-6)
        if np.sum(np.abs(coef - old)) < 1e-3:
            break
    coef = np.linalg.solve(gram + (lam / alpha) * np.eye(d), xty)
    want_coef = coef / s
    want_intercept = y_mean - float(want_coef @ mu)

    assert np.allclose(model.coef, want_coef, rtol=1e-6, atol=1e-8)
    assert abs(model.intercept - want_intercept) < 1e-6
    assert abs(model.alpha_ - alpha) / alpha < 1e-4
    assert abs(model.lambda_ - lam) / lam < 1e-4


def test_train_with_tracking_registers_models(wine_like, tmp_path):
    """Full reference round trip (utils.py:180-250): experiment get-or-create,
    per-model run, param/metric/tag logging, registry version — via tracker."""
    from airflow_etl_elt_spark.ml.regression import train_wine_models
    from airflow_etl_elt_spark.ml.tracking import TrackingClient

    tracker = TrackingClient(tmp_path / "mlruns")
    # rng pinned so exactly one (cheap) model trains
    rng = random.Random(7)
    out = train_wine_models(wine_like.limit(120), rng=rng, tracker=tracker)
    assert out, "at least one model trained"
    for rec in out:
        assert {"experiment_id", "run_id", "model_uri", "model_version", "run_url"} <= rec.keys()
        run = tracker.get_run(rec["run_id"])
        assert run["metrics"]["r2_test"] == rec["r2_test"]
        assert run["params"]["model_name"] == rec["name"]
        mv = tracker.get_latest_version(f"wine-{rec['name']}")
        assert mv is not None and mv.run_id == rec["run_id"]
    exp = tracker.get_experiment_by_name("wine")
    assert exp is not None and exp.tags == {"version": "v1", "priority": "P1"}
