"""
``adell classification model_to_export`` — serialize a trained classifier
to a standalone StableHLO artifact.

Parity target: adell_mri/entrypoints/classification/model_to_torchscript.py
(trace the trained net to a framework-free artifact); TPU-native via
jax.export (adell_mri_tpu/train/export.py).
"""

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_classification_network
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.export import export_model

ARG_KEYS = [
    "checkpoint_dir",
    "checkpoint_name",
    "n_classes",
    "output_path",
    "classification_net_type",
    "batch_size",
]


def main(arguments):
    parser = Parser(prog="adell classification model_to_export")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    mngr = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or "classification",
        fold=0,
    )
    metadata = mngr.load_metadata()
    net_cfg = metadata.get("network_config", {})
    t_args = metadata.get("transform_arguments", {})
    n_classes = metadata.get("n_classes", args.n_classes)
    net_type = metadata.get("net_type", args.classification_net_type)
    image_keys = t_args.get("image_keys", ["image"])
    size = tuple(t_args.get("target_size"))

    model = get_classification_network(net_type, net_cfg, n_classes=n_classes)
    shape = (args.batch_size,) + size + (len(image_keys),)
    x0 = np.zeros(shape, np.float32)
    params0 = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    params = mngr.restore(mngr.best_step(), target={"params": params0})[
        "params"
    ]

    def apply_fn(p, x):
        return model.apply({"params": p}, x, train=False)

    export_model(
        apply_fn,
        params,
        shape,
        args.output_path,
        metadata={
            "net_type": net_type,
            "n_classes": n_classes,
            "transform_arguments": t_args,
        },
    )
