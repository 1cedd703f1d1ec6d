"""Tracking/registry parity tests (SURVEY §2 row 45; reference utils.py:180-250)."""

import json
import threading

import pytest

from airflow_etl_elt_spark.ml.tracking import ActiveRun, TrackingClient


@pytest.fixture()
def client(tmp_path):
    return TrackingClient(tmp_path / "mlruns")


def test_experiment_create_search_get(client):
    exp_id = client.create_experiment("wine", tags={"version": "v1", "priority": "P1"})
    # the reference's search-by-name filter string (utils.py:187-189)
    found = client.search_experiments(filter_string="name = 'wine'")
    assert [e.experiment_id for e in found] == [exp_id]
    exp = client.get_experiment(exp_id)
    assert exp.name == "wine" and exp.tags["priority"] == "P1"
    assert client.search_experiments(filter_string="name = 'nope'") == []
    with pytest.raises(ValueError):
        client.create_experiment("wine")


def test_get_or_create_is_idempotent(client):
    a = client.get_or_create_experiment("wine")
    b = client.get_or_create_experiment("wine")
    assert a.experiment_id == b.experiment_id


def test_run_logging_round_trip(client):
    exp_id = client.create_experiment("wine")
    with client.start_run(exp_id) as run:
        assert isinstance(run, ActiveRun)
        run.log_params({"model_name": "lr", "degree": 2})
        run.log_metric("r2_train", 0.91)
        run.log_metric("r2_test", 0.87)
        run.set_tag("wine_tag", "Predict alcohol index with lr")
        run_id = run.info.run_id
    rec = client.get_run(run_id)
    assert rec["info"].status == "FINISHED"
    assert rec["params"] == {"model_name": "lr", "degree": 2}
    assert rec["metrics"] == {"r2_train": 0.91, "r2_test": 0.87}
    assert rec["tags"]["wine_tag"].startswith("Predict alcohol")


def test_failed_run_marked(client):
    exp_id = client.create_experiment("wine")
    with pytest.raises(RuntimeError):
        with client.start_run(exp_id) as run:
            run_id = run.info.run_id
            raise RuntimeError("boom")
    assert client.get_run(run_id)["info"].status == "FAILED"


def test_artifact_logging(client, tmp_path):
    exp_id = client.create_experiment("wine")
    src = tmp_path / "chart.pdf"
    src.write_bytes(b"%PDF-1.4 fake")
    with client.start_run(exp_id) as run:
        dst = run.log_artifact(src)
    assert open(dst, "rb").read() == b"%PDF-1.4 fake"


def test_registry_versions_increment(client):
    exp_id = client.create_experiment("wine")
    with client.start_run(exp_id) as run:
        uri = f"runs:/{run.info.run_id}/model"
        v1 = client.register_model(uri, "wine-lr")
        v2 = client.register_model(uri, "wine-lr")
    assert (v1.version, v2.version) == (1, 2)
    assert v2.run_id == run.info.run_id  # parsed from runs:/ URI
    latest = client.get_latest_version("wine-lr")
    assert latest.version == 2 and latest.source == uri
    assert [m.version for m in client.search_model_versions("wine-lr")] == [1, 2]
    assert client.get_latest_version("absent") is None


def test_registry_concurrent_writers_get_distinct_versions(client):
    """O_EXCL claim loop: parallel registrations never mint the same version."""
    errs = []

    def register():
        try:
            client.register_model("models:/x", "wine-gbt")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=register) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert [m.version for m in client.search_model_versions("wine-gbt")] == list(range(1, 9))


def test_store_survives_reopen(client, tmp_path):
    exp_id = client.create_experiment("wine")
    with client.start_run(exp_id) as run:
        run.log_metric("r2_test", 0.5)
        run_id = run.info.run_id
    reopened = TrackingClient(tmp_path / "mlruns")
    assert reopened.get_experiment_by_name("wine").experiment_id == exp_id
    assert reopened.get_run(run_id)["metrics"] == {"r2_test": 0.5}


def test_file_uri_prefix_accepted(tmp_path):
    c = TrackingClient(f"file://{tmp_path}/mlruns")
    exp_id = c.create_experiment("wine")
    meta = json.loads((tmp_path / "mlruns" / "experiments" / exp_id / "meta.json").read_text())
    assert meta["name"] == "wine"


def test_file_uri_relative_not_rerooted(tmp_path, monkeypatch):
    # ADVICE r2: 'file:mlruns' must resolve relative to cwd, not become '/mlruns'
    monkeypatch.chdir(tmp_path)
    c = TrackingClient("file:mlruns")
    assert c.root.resolve() == (tmp_path / "mlruns").resolve()


def test_file_uri_with_host_rejected():
    import pytest

    with pytest.raises(ValueError, match="host"):
        TrackingClient("file://somehost/path")


def test_registry_readers_skip_orphan_version_dirs(client):
    # a crash between mkdir (claim) and the meta.json write leaves an orphan;
    # readers must skip it and the next writer must not reuse its number
    client.register_model("models:/x", "wine-lr")
    versions_dir = client.root / "registry" / "wine-lr" / "versions"
    (versions_dir / "2").mkdir()  # orphan: claimed, no meta.json
    assert client.get_latest_version("wine-lr").version == 1
    assert [m.version for m in client.search_model_versions("wine-lr")] == [1]
    mv = client.register_model("models:/x", "wine-lr")
    assert mv.version == 3  # orphan's number is skipped, never reused
    assert [m.version for m in client.search_model_versions("wine-lr")] == [1, 3]
