"""Experiment tracking + model registry (SURVEY §2 row 45).

The reference trains scikit-learn pipelines under an MLflow tracking server
and registers the fitted model (/root/reference/dags/include/utils.py:180-250:
``set_tracking_uri`` → ``create_experiment``/``search_experiments`` →
``start_run`` → param/metric/tag logging → ``register_model``).  That round
trip is the contract this module re-implements.

``mlflow`` is not installed in this environment, so the store is a
self-contained file-backed implementation of the same API subset the
reference exercises.  The method names and shapes deliberately mirror
``mlflow.MlflowClient`` so swapping the backend for a real tracking server
is a constructor change, not a rewrite; when the real package is importable,
:func:`mlflow_available` reports it and :meth:`TrackingClient.export_to_mlflow`
replays a local experiment into it.

Layout (one JSON file per record — atomic rename writes, no partial reads):

    <root>/experiments/<exp_id>/meta.json
    <root>/experiments/<exp_id>/runs/<run_id>/{meta,params,metrics,tags}.json
    <root>/experiments/<exp_id>/runs/<run_id>/artifacts/...
    <root>/registry/<model_name>/versions/<v>/meta.json

Scale notes: tracking is driver-side metadata (a handful of KB per run) —
it never touches executors, so nothing here affects the 100 TB story.  The
registry's version counter is claimed with O_EXCL lock-file semantics so
concurrent DAG runs on a shared filesystem cannot mint the same version.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterator

try:  # pragma: no cover - not installed in this environment
    import mlflow as _mlflow
except Exception:  # pragma: no cover
    _mlflow = None


def mlflow_available() -> bool:
    """True when the real ``mlflow`` package is importable."""
    return _mlflow is not None


def _atomic_write_json(path: Path, payload: dict) -> None:
    tmp = path.with_suffix(path.suffix + f".tmp-{uuid.uuid4().hex[:8]}")
    tmp.write_text(json.dumps(payload, indent=2, sort_keys=True))
    os.replace(tmp, path)


def _read_json(path: Path) -> dict:
    return json.loads(path.read_text())


@dataclass
class ExperimentInfo:
    experiment_id: str
    name: str
    artifact_location: str
    tags: dict[str, str] = field(default_factory=dict)
    creation_time: float = 0.0


@dataclass
class RunInfo:
    run_id: str
    experiment_id: str
    status: str = "RUNNING"
    start_time: float = 0.0
    end_time: float | None = None


@dataclass
class ModelVersion:
    name: str
    version: int
    source: str
    run_id: str | None = None


class ActiveRun:
    """Context handle returned by :meth:`TrackingClient.start_run`.

    Mirrors ``mlflow.ActiveRun``: ``run.info.run_id`` etc., plus the logging
    methods the reference calls on the module/client.
    """

    def __init__(self, client: "TrackingClient", info: RunInfo):
        self._client = client
        self.info = info

    def log_param(self, key: str, value: Any) -> None:
        self._client.log_param(self.info.run_id, key, value)

    def log_params(self, params: dict[str, Any]) -> None:
        for k, v in params.items():
            self.log_param(k, v)

    def log_metric(self, key: str, value: float) -> None:
        self._client.log_metric(self.info.run_id, key, value)

    def log_metrics(self, metrics: dict[str, float]) -> None:
        for k, v in metrics.items():
            self.log_metric(k, v)

    def set_tag(self, key: str, value: str) -> None:
        self._client.set_tag(self.info.run_id, key, value)

    def log_artifact(self, local_path: str | Path) -> str:
        return self._client.log_artifact(self.info.run_id, local_path)


class TrackingClient:
    """File-backed ``MlflowClient`` stand-in (API subset utils.py:180-250 uses)."""

    def __init__(self, tracking_uri: str | Path):
        uri = str(tracking_uri)
        if uri.startswith("file:"):
            from urllib.parse import urlparse

            parsed = urlparse(uri)
            if parsed.netloc:  # file://host/path — remote hosts unsupported
                raise ValueError(
                    f"file: URI with a host is not supported: {uri!r} "
                    "(use file:///absolute/path)"
                )
            # file:///abs/path → /abs/path; file:relative → ./relative
            # (ADVICE r2: the old slash-stripping silently rerooted
            # 'file:mlruns' to '/mlruns')
            uri = parsed.path or "."
        self.root = Path(uri)
        (self.root / "experiments").mkdir(parents=True, exist_ok=True)
        (self.root / "registry").mkdir(parents=True, exist_ok=True)
        self._run_index: dict[str, Path] = {}

    # -- experiments ------------------------------------------------------
    def create_experiment(
        self,
        name: str,
        artifact_location: str | None = None,
        tags: dict[str, str] | None = None,
    ) -> str:
        if self.get_experiment_by_name(name) is not None:
            raise ValueError(f"experiment {name!r} already exists")
        exp_id = uuid.uuid4().hex[:16]
        exp_dir = self.root / "experiments" / exp_id
        (exp_dir / "runs").mkdir(parents=True)
        if artifact_location is None:
            artifact_location = str(exp_dir / "artifacts")
        _atomic_write_json(
            exp_dir / "meta.json",
            {
                "experiment_id": exp_id,
                "name": name,
                "artifact_location": artifact_location,
                "tags": tags or {},
                "creation_time": time.time(),
            },
        )
        return exp_id

    def get_experiment(self, experiment_id: str) -> ExperimentInfo | None:
        meta = self.root / "experiments" / experiment_id / "meta.json"
        if not meta.exists():
            return None
        return ExperimentInfo(**_read_json(meta))

    def get_experiment_by_name(self, name: str) -> ExperimentInfo | None:
        for exp in self.search_experiments():
            if exp.name == name:
                return exp
        return None

    def search_experiments(self, filter_string: str | None = None) -> list[ExperimentInfo]:
        """Supports the one filter the reference uses: ``name = '<x>'``."""
        out = []
        for meta in sorted((self.root / "experiments").glob("*/meta.json")):
            out.append(ExperimentInfo(**_read_json(meta)))
        if filter_string:
            key, _, raw = filter_string.partition("=")
            if key.strip() != "name":
                raise ValueError(f"unsupported filter: {filter_string!r}")
            want = raw.strip().strip("'\"")
            out = [e for e in out if e.name == want]
        return out

    def get_or_create_experiment(
        self, name: str, artifact_location: str | None = None, tags: dict[str, str] | None = None
    ) -> ExperimentInfo:
        """The reference's search-then-create dance (utils.py:186-200), in one call."""
        existing = self.get_experiment_by_name(name)
        if existing is not None:
            return existing
        exp = self.get_experiment(self.create_experiment(name, artifact_location, tags))
        assert exp is not None
        return exp

    # -- runs -------------------------------------------------------------
    def _run_dir(self, run_id: str) -> Path:
        cached = self._run_index.get(run_id)
        if cached is not None and cached.exists():
            return cached
        hits = list((self.root / "experiments").glob(f"*/runs/{run_id}"))
        if not hits:
            raise KeyError(f"unknown run_id {run_id!r}")
        self._run_index[run_id] = hits[0]
        return hits[0]

    @contextmanager
    def start_run(self, experiment_id: str) -> Iterator[ActiveRun]:
        exp = self.get_experiment(experiment_id)
        if exp is None:
            raise KeyError(f"unknown experiment_id {experiment_id!r}")
        run_id = uuid.uuid4().hex
        run_dir = self.root / "experiments" / experiment_id / "runs" / run_id
        (run_dir / "artifacts").mkdir(parents=True)
        info = RunInfo(run_id=run_id, experiment_id=experiment_id, start_time=time.time())
        self._run_index[run_id] = run_dir
        _atomic_write_json(run_dir / "meta.json", info.__dict__)
        for name in ("params", "metrics", "tags"):
            _atomic_write_json(run_dir / f"{name}.json", {})
        run = ActiveRun(self, info)
        try:
            yield run
        except Exception:
            info.status = "FAILED"
            raise
        else:
            info.status = "FINISHED"
        finally:
            info.end_time = time.time()
            _atomic_write_json(run_dir / "meta.json", info.__dict__)

    def get_run(self, run_id: str) -> dict[str, Any]:
        run_dir = self._run_dir(run_id)
        return {
            "info": RunInfo(**_read_json(run_dir / "meta.json")),
            "params": _read_json(run_dir / "params.json"),
            "metrics": _read_json(run_dir / "metrics.json"),
            "tags": _read_json(run_dir / "tags.json"),
        }

    def _merge(self, run_id: str, bucket: str, key: str, value: Any) -> None:
        # SINGLE-WRITER-PER-RUN contract (mirrors mlflow's file store): the
        # atomic rename prevents torn READS, but concurrent writers to the
        # same run can lose updates (read-modify-write race). Runs here are
        # created and logged by one driver process; parallel model training
        # logs to DISTINCT runs (ml/regression.py), so the contract holds.
        path = self._run_dir(run_id) / f"{bucket}.json"
        data = _read_json(path)
        data[key] = value
        _atomic_write_json(path, data)

    def log_param(self, run_id: str, key: str, value: Any) -> None:
        self._merge(run_id, "params", key, value if isinstance(value, (int, float, bool)) else str(value))

    def log_metric(self, run_id: str, key: str, value: float) -> None:
        self._merge(run_id, "metrics", key, float(value))

    def set_tag(self, run_id: str, key: str, value: str) -> None:
        self._merge(run_id, "tags", key, str(value))

    def log_artifact(self, run_id: str, local_path: str | Path) -> str:
        src = Path(local_path)
        dst = self._run_dir(run_id) / "artifacts" / src.name
        dst.write_bytes(src.read_bytes())
        return str(dst)

    # -- registry ---------------------------------------------------------
    def register_model(self, model_uri: str, name: str, run_id: str | None = None) -> ModelVersion:
        """``mlflow.register_model`` parity (utils.py:241): auto-increment
        version per name; ``runs:/<run_id>/model`` URIs resolve run_id."""
        if model_uri.startswith("runs:/") and run_id is None:
            run_id = model_uri.split("/")[1]
        model_dir = self.root / "registry" / name
        versions_dir = model_dir / "versions"
        versions_dir.mkdir(parents=True, exist_ok=True)
        # O_EXCL claim loop: concurrent writers each end up with a distinct version.
        while True:
            version = 1 + max(
                (int(p.name) for p in versions_dir.iterdir() if p.name.isdigit()), default=0
            )
            try:
                (versions_dir / str(version)).mkdir()
                break
            except FileExistsError:
                continue
        mv = ModelVersion(name=name, version=version, source=model_uri, run_id=run_id)
        _atomic_write_json(versions_dir / str(version) / "meta.json", mv.__dict__)
        return mv

    def _readable_versions(self, name: str) -> list[int]:
        """Version numbers whose meta.json exists. A version dir is CLAIMED
        by mkdir before its meta.json lands (register_model), so a concurrent
        reader — or a crash between the two steps — can observe a meta-less
        dir. Readers skip those (ADVICE r2); the claim loop still counts them
        so an orphan never causes a number reuse or a retry livelock."""
        versions_dir = self.root / "registry" / name / "versions"
        if not versions_dir.exists():
            return []
        return sorted(
            int(p.name)
            for p in versions_dir.iterdir()
            if p.name.isdigit() and (p / "meta.json").exists()
        )

    def get_latest_version(self, name: str) -> ModelVersion | None:
        nums = self._readable_versions(name)
        if not nums:
            return None
        versions_dir = self.root / "registry" / name / "versions"
        return ModelVersion(**_read_json(versions_dir / str(nums[-1]) / "meta.json"))

    def search_model_versions(self, name: str) -> list[ModelVersion]:
        versions_dir = self.root / "registry" / name / "versions"
        return [
            ModelVersion(**_read_json(versions_dir / str(v) / "meta.json"))
            for v in self._readable_versions(name)
        ]

    # -- optional real-mlflow bridge --------------------------------------
    def export_to_mlflow(self, experiment_name: str, tracking_uri: str) -> None:
        """Replay a local experiment into a real MLflow server (optional path).

        Only usable when ``mlflow`` is installed; kept behind the import-try
        so the engine has zero hard dependency on it.
        """
        if _mlflow is None:  # pragma: no cover
            raise RuntimeError("mlflow is not installed; export unavailable")
        exp = self.get_experiment_by_name(experiment_name)  # pragma: no cover
        if exp is None:  # pragma: no cover
            raise KeyError(experiment_name)
        _mlflow.set_tracking_uri(tracking_uri)  # pragma: no cover
        _mlflow.set_experiment(experiment_name)  # pragma: no cover
        for run_dir in sorted(  # pragma: no cover
            (self.root / "experiments" / exp.experiment_id / "runs").iterdir()
        ):
            rec = self.get_run(run_dir.name)
            with _mlflow.start_run():
                _mlflow.log_params(rec["params"])
                _mlflow.log_metrics(rec["metrics"])
                _mlflow.set_tags(rec["tags"])
