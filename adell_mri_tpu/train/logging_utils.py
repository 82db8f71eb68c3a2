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
        summary_dir: Optional[str] = None,
        tracking_uri: Optional[str] = None,
        log_model: bool = False,
    ):
        self.csv = CSVLogger(csv_path) if csv_path else None
        self.backend = None
        self.backend_type = None
        self.log_model = log_model
        if logger_type == "wandb":
            try:
                import wandb

                self.backend = wandb.init(
                    project=project_name, name=run_name, config=config or {},
                    dir=summary_dir,
                )
                self._log = lambda m, step: self.backend.log(m, step=step)
                self.backend_type = "wandb"
            except ImportError:
                logger.warning("wandb not installed; falling back to CSV only")
        elif logger_type == "mlflow":
            try:
                import mlflow

                if tracking_uri:
                    mlflow.set_tracking_uri(tracking_uri)
                mlflow.set_experiment(project_name or "adell")
                mlflow.start_run(run_name=run_name)
                self._log = lambda m, step: mlflow.log_metrics(m, step=step)
                self.backend = mlflow
                self.backend_type = "mlflow"
            except ImportError:
                logger.warning("mlflow not installed; falling back to CSV only")

    def log_artifact(self, path: str):
        """Uploads a file/dir to the tracker when --log_model is on
        (parity: ref --log_model, assemble_args.py log_model)."""
        if not self.log_model or self.backend is None:
            return
        import os

        try:
            if self.backend_type == "wandb":
                if os.path.isdir(path):
                    # wandb.save takes a file GLOB — a bare directory
                    # matches nothing; policy="now" uploads before any
                    # later checkpoint deletion
                    self.backend.save(
                        os.path.join(path, "**", "*"),
                        base_path=os.path.dirname(path),
                        policy="now",
                    )
                else:
                    self.backend.save(path, policy="now")
            elif self.backend_type == "mlflow":
                if os.path.isdir(path):
                    self.backend.log_artifacts(path)
                else:
                    self.backend.log_artifact(path)
        except Exception as exc:  # logging must not kill training
            logger.warning("log_artifact(%s) failed: %s", path, exc)

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


def save_image_panel(path, images, max_images: int = 16):
    """
    Tiles a batch of images/volumes into one PNG grid (parity:
    utils/pl_callbacks.py — LogImage :195, LogImageFromDiffusionProcess
    :276, LogImageFromGAN :326; this framework writes panels to disk and,
    when a wandb backend is active, MetricLogger.log_image uploads them).
    Volumes use their central slice; channels beyond the first are dropped.
    """
    import numpy as np
    from PIL import Image

    arr = np.asarray(images)[:max_images]
    tiles = []
    for img in arr:
        if img.ndim == 4:  # [X, Y, Z, C] -> central z slice, first channel
            img = img[:, :, img.shape[2] // 2, 0]
        elif img.ndim == 3:  # [X, Y, C]
            img = img[..., 0]
        lo, hi = float(img.min()), float(img.max())
        tiles.append(
            np.uint8((img - lo) / max(hi - lo, 1e-6) * 255)
        )
    side = int(np.ceil(np.sqrt(len(tiles))))
    h = max(t.shape[0] for t in tiles)
    w = max(t.shape[1] for t in tiles)
    panel = np.zeros((side * h, side * w), np.uint8)
    for i, t in enumerate(tiles):
        r, c = divmod(i, side)
        panel[r * h : r * h + t.shape[0], c * w : c * w + t.shape[1]] = t
    Image.fromarray(panel).save(path)
    return path


class ImagePanelCallback:
    """
    TrainLoop-compatible sampler panel: every ``every_n_epochs`` epochs
    calls ``sample_fn(state, rng) -> [N, ...]`` and writes a PNG panel
    (the diffusion/GAN image-logging callbacks of the reference).
    """

    def __init__(self, sample_fn, output_dir, every_n_epochs: int = 1,
                 metric_logger=None, name: str = "samples"):
        import os

        self.sample_fn = sample_fn
        self.output_dir = output_dir
        self.every_n_epochs = every_n_epochs
        self.metric_logger = metric_logger
        self.name = name
        os.makedirs(output_dir, exist_ok=True)

    def on_epoch_end(self, state, metrics, epoch, rng=None):
        import os

        import jax

        if (epoch + 1) % self.every_n_epochs:
            return None
        rng = rng if rng is not None else jax.random.PRNGKey(epoch)
        images = self.sample_fn(state, rng)
        path = os.path.join(
            self.output_dir, f"{self.name}_epoch{epoch + 1}.png"
        )
        save_image_panel(path, images)
        logger.info("wrote sample panel %s", path)
        return None
