"""
Reference-checkpoint interop for ConvNeXt backbones
(adell_mri/modules/layers/conv_next.py:86 ConvNeXtBackbone — stem
``input_layer`` + per-stage block lists ``operations`` + parameter-free
max-pool stage transitions) onto our
``models/layers/conv_next.py::ConvNeXtBackbone(downsample="maxpool")``
(the reference-compat mode; the default "conv" mode uses ConvNeXt-paper
norm+strided-conv downsampling, which carries parameters a reference
checkpoint does not have).

Block mapping (res_blocks.py:429-560 ConvNeXtBlock2d/3d -> our
ConvNeXtBlock):
  dwconv      -> Conv_0 (depthwise kernel (*k, 1, C) from torch (C,1,*k))
  norm        -> LayerNorm_0 (scale/bias)
  pwconv1     -> Dense_0
  pwconv2     -> Dense_1
  gamma       -> LayerScale_0/layer_scale
  out_layer.0 -> Conv_1 (channel projection; the trailing GELU is
                 parameter-free on both sides)
"""

from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np

from adell_mri_tpu.interop.mapping import _conv_w, _Mapper

__all__ = ["import_reference_convnext_backbone"]


def import_reference_convnext_backbone(
    state_dict: Mapping[str, np.ndarray],
    *,
    structure: Sequence[Sequence[int]],
    prefix: str = "",
    strict: bool = True,
) -> Dict[str, Any]:
    """Maps a reference ConvNeXtBackbone state dict (optionally nested
    under ``prefix``, e.g. ``backbone.`` inside an SSL module) onto our
    maxpool-mode ConvNeXtBackbone params."""
    if prefix:
        state_dict = {
            k[len(prefix):]: v
            for k, v in state_dict.items()
            if k.startswith(prefix)
        }
    m = _Mapper(state_dict, "layer", "gelu", strict)

    # stem: conv + channels-first LayerNorm (init_input_layer :151-158)
    m.conv("input_layer.0", ("stem_conv",))
    w = m.take("input_layer.1.weight")
    b = m.take("input_layer.1.bias")
    if w is not None:
        # the reference's channels-first LayerNorm stores (1, C) weights
        m.params.setdefault("stem_norm", {})["scale"] = w.reshape(-1)
    if b is not None:
        m.params.setdefault("stem_norm", {})["bias"] = b.reshape(-1)

    for s, stage in enumerate(structure):
        n_blocks = stage[3]
        for blk in range(n_blocks):
            t = f"operations.{s}.{blk}"
            f = f"stage{s}_block{blk}"
            # depthwise: torch (C, 1, *k) -> flax grouped-conv (*k, 1, C)
            dw = m.take(f"{t}.dwconv.weight")
            if dw is not None:
                nd = dw.ndim - 2
                dwk = np.transpose(
                    dw, tuple(range(2, 2 + nd)) + (1, 0)
                )
                m.params.setdefault(f, {}).setdefault("Conv_0", {})[
                    "kernel"
                ] = dwk
            dwb = m.take(f"{t}.dwconv.bias")
            if dwb is not None:
                m.params[f]["Conv_0"]["bias"] = dwb
            ln_w = m.take(f"{t}.norm.weight")
            ln_b = m.take(f"{t}.norm.bias")
            node = m.params.setdefault(f, {})
            node["LayerNorm_0"] = {"scale": ln_w, "bias": ln_b}
            m.linear(f"{t}.pwconv1", (f, "Dense_0"))
            m.linear(f"{t}.pwconv2", (f, "Dense_1"))
            if f"{t}.gamma" in m.sd:
                node["LayerScale_0"] = {"layer_scale": m.take(f"{t}.gamma")}
            if f"{t}.out_layer.0.weight" in m.sd:
                m.conv(f"{t}.out_layer.0", (f, "Conv_1"))

    out: Dict[str, Any] = {"params": m.params}
    if strict:
        leftovers = [
            k
            for k in m.sd
            if k not in m.used and not k.endswith("num_batches_tracked")
        ]
        if leftovers:
            raise ValueError(
                f"unmapped reference parameters ({len(leftovers)}): "
                f"{leftovers[:8]}..."
            )
    return out
