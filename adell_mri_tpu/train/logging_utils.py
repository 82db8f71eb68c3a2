"""
Metric logging sinks.

Parity targets: adell_mri/utils/logging.py CSVLogger (:46, append-style
per-fold/per-checkpoint metric rows) and utils/pl_utils.py get_logger
(:345-419, wandb/MLflow selection — both gated on availability here since
this image ships neither).
"""

import csv
import os
import time
from typing import Any, Dict, Optional

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


class CSVLogger:
    """Accumulates rows and writes one CSV (parity: logging.py:46)."""

    def __init__(self, path: str):
        self.path = path
        self.rows = []

    def log(self, **row: Any):
        self.rows.append(dict(row))

    def write(self):
        if not self.rows:
            return
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        keys = sorted({k for r in self.rows for k in r})
        exists = os.path.exists(self.path)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            if not exists:
                w.writeheader()
            for r in self.rows:
                w.writerow(r)
        self.rows = []


class MetricLogger:
    """
    Fan-out logger: CSV always; wandb/mlflow when installed and requested
    (parity: --logger_type, assemble_args.py:270).
    """

    def __init__(
        self,
        logger_type: Optional[str] = None,
        project_name: Optional[str] = None,
        run_name: Optional[str] = None,
        csv_path: Optional[str] = None,
        config: Optional[Dict] = None,
    ):
        self.csv = CSVLogger(csv_path) if csv_path else None
        self.backend = None
        if logger_type == "wandb":
            try:
                import wandb

                self.backend = wandb.init(
                    project=project_name, name=run_name, config=config or {}
                )
                self._log = lambda m, step: self.backend.log(m, step=step)
            except ImportError:
                logger.warning("wandb not installed; falling back to CSV only")
        elif logger_type == "mlflow":
            try:
                import mlflow

                mlflow.set_experiment(project_name or "adell")
                mlflow.start_run(run_name=run_name)
                self._log = lambda m, step: mlflow.log_metrics(m, step=step)
                self.backend = mlflow
            except ImportError:
                logger.warning("mlflow not installed; falling back to CSV only")

    def log_metrics(self, metrics: Dict[str, float], step: int = 0, **tags):
        metrics = {
            k: float(v) for k, v in metrics.items() if _is_number(v)
        }
        if self.backend is not None:
            self._log(metrics, step)
        if self.csv is not None:
            for k, v in metrics.items():
                self.csv.log(
                    metric=k, value=v, step=step, time=time.time(), **tags
                )
            self.csv.write()
        logger.info(
            "step %d | %s",
            step,
            " ".join(f"{k}={v:.5g}" for k, v in metrics.items()),
        )


def _is_number(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
