"""
Validation-epoch lesion evaluation.

Parity target: adell_mri/modules/segmentation/pl.py:443-449,604-626 —
``--picai_eval`` accumulates CPU predictions per validation step and runs the
lesion-level PI-CAI evaluation in ``on_validation_epoch_end``, logging
V_AP / V_AUC / V_score every epoch.
"""

from typing import Dict, Optional

import numpy as np

from adell_mri_tpu.eval.lesion import evaluate
from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)


class LesionEvalCallback:
    """
    TrainLoop callback: ``on_validation_batch`` runs its own jitted
    probability forward on each validation batch and accumulates host-side
    predictions; ``on_validation_end`` computes the lesion metrics and
    returns {"V_AP", "V_AUC", "V_score"} merged into the epoch's validation
    metrics. ``max_cases`` bounds host memory.
    """

    def __init__(
        self,
        model,
        n_classes: int = 2,
        max_cases: int = 128,
        min_overlap: float = 0.10,
        num_parallel_calls: int = 4,
    ):
        import jax

        self.n_classes = n_classes
        self.max_cases = max_cases
        self.min_overlap = min_overlap
        self.num_parallel_calls = num_parallel_calls
        self._preds = []
        self._labels = []

        def predict(params, x):
            out = model.apply({"params": params}, x, train=False)
            pred = out[0] if isinstance(out, tuple) else out
            # UNet folds sigmoid/softmax into final_layer: pred is already
            # a probability map [B, *S, C_out]
            if pred.shape[-1] == 1:
                return pred[..., 0]
            # multiclass: foreground probability = 1 - p(background)
            return 1.0 - pred[..., 0]

        self._predict = jax.jit(predict)

    def on_validation_batch(self, params, batch: Dict, metrics: Dict):
        if len(self._preds) >= self.max_cases:
            return
        pred = np.asarray(self._predict(params, batch["image"]))
        label = np.asarray(batch["label"])
        if label.ndim == pred.ndim + 1:
            label = label[..., 0]
        for i in range(pred.shape[0]):
            if len(self._preds) >= self.max_cases:
                break
            self._preds.append(pred[i])
            self._labels.append(label[i])

    def on_validation_end(self, params) -> Optional[Dict[str, float]]:
        if not self._preds:
            return None
        m = evaluate(
            self._preds,
            self._labels,
            min_overlap=self.min_overlap,
            num_parallel_calls=self.num_parallel_calls,
            # the reference's validation postprocess is get_lesions with
            # DEFAULTS: a binary x > 0.1 map, NOT candidate extraction
            # (segmentation/pl.py:75-95,604-611)
            y_det_postprocess_func=lambda y: y > 0.1,
        )
        self._preds, self._labels = [], []
        out = {"V_AP": m.AP, "V_AUC": m.auroc, "V_score": m.score}
        return {
            k: float(v) for k, v in out.items() if np.isfinite(v)
        } or None


class ClassificationMetricsCallback:
    """
    TrainLoop callback: accumulates validation probabilities and labels,
    emitting the full metric dictionary every validation epoch (parity:
    the per-phase torchmetrics dicts the reference updates in
    validation_step, classification/pl.py:99-160 + update_metrics —
    Rec/Spe/Pr/F1/AUC/CalErr, macro-averaged with per-class entries for
    nc > 2). Probabilities are computed by one extra jitted forward per
    validation batch; ``max_cases`` bounds host memory.
    """

    def __init__(
        self,
        model,
        n_classes: int = 2,
        max_cases: int = 4096,
        feature_key: Optional[str] = None,
        ordinal: bool = False,
    ):
        import jax

        self.n_classes = n_classes
        self.max_cases = max_cases
        self.feature_key = feature_key
        self.ordinal = ordinal
        self._probs = []
        self._labels = []

        def predict(params, x, *feats):
            logits = model.apply({"params": params}, x, *feats, train=False)
            if isinstance(logits, tuple):
                logits = logits[0]
            if ordinal:
                # OrdNet emits n_classes-1 CUMULATIVE threshold logits
                # (P(y > k)); see ordinal_to_class_probs.
                from adell_mri_tpu.models.classification.losses import (
                    ordinal_to_class_probs,
                )

                return ordinal_to_class_probs(logits)
            if n_classes > 2:
                return jax.nn.softmax(logits, -1)
            return jax.nn.sigmoid(
                logits[..., 0] if logits.ndim > 1 else logits
            )

        self._predict = jax.jit(predict)

    def on_validation_batch(self, params, batch: Dict, metrics: Dict):
        if len(self._probs) >= self.max_cases:
            return
        args = (batch["image"],)
        if self.feature_key and self.feature_key in batch:
            args = args + (batch[self.feature_key],)
        probs = np.asarray(self._predict(params, *args))
        labels = np.asarray(batch["label"]).reshape(-1)
        for i in range(probs.shape[0]):
            if len(self._probs) >= self.max_cases:
                break
            self._probs.append(probs[i])
            self._labels.append(labels[i])

    def on_validation_end(self, params) -> Optional[Dict[str, float]]:
        from adell_mri_tpu.eval.metrics import (
            binary_metrics,
            multiclass_metrics,
        )

        if not self._probs:
            return None
        probs = np.stack(self._probs)
        labels = np.asarray(self._labels)
        self._probs, self._labels = [], []
        if self.n_classes > 2 or self.ordinal:
            m = multiclass_metrics(probs, labels)
        else:
            m = binary_metrics(probs, labels)
        return {
            f"V_{k}": float(v) for k, v in m.items() if np.isfinite(v)
        } or None
