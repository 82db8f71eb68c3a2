"""
``adell ssl model_to_export`` — serialize a trained SSL encoder to a
standalone StableHLO artifact (parity:
adell_mri/entrypoints/ssl/model_to_torchscript.py).
"""

import jax
import numpy as np

from adell_mri_tpu.config.factories import get_ssl_network
from adell_mri_tpu.entrypoints.assemble_args import Parser
from adell_mri_tpu.train.checkpoints import CheckpointManager
from adell_mri_tpu.train.export import export_model

ARG_KEYS = [
    "checkpoint_dir",
    "checkpoint_name",
    "output_path",
    "ssl_method",
    "batch_size",
]


def main(arguments):
    parser = Parser(prog="adell ssl model_to_export")
    parser.add_argument_by_key(ARG_KEYS)
    args = parser.parse_args(arguments)

    mngr = CheckpointManager(
        args.checkpoint_dir,
        name=args.checkpoint_name or f"ssl_{args.ssl_method}",
        fold=0,
    )
    metadata = mngr.load_metadata()
    net_cfg = metadata.get("network_config", {})
    t_args = metadata.get("transform_arguments", {})
    method = metadata.get("ssl_method", args.ssl_method)
    size = tuple(t_args.get("target_size") or (64, 64, 32))

    model = get_ssl_network(method, net_cfg)
    shape = (args.batch_size or 1,) + size + (1,)
    x0 = np.zeros(shape, np.float32)
    init_vars = model.init({"params": jax.random.PRNGKey(0)}, x0)
    target = {"params": init_vars["params"]}
    extra = {k: v for k, v in init_vars.items() if k != "params"}
    if extra:
        target["variables"] = extra
    restored = mngr.restore(mngr.best_step(), target=target)
    variables = restored.get("variables", {})

    def apply_fn(p, x):
        out = model.apply({"params": p, **variables}, x, train=False)
        return out[0] if isinstance(out, (tuple, list)) else out

    export_model(
        apply_fn,
        restored["params"],
        shape,
        args.output_path,
        metadata={"ssl_method": method, "transform_arguments": t_args},
    )
