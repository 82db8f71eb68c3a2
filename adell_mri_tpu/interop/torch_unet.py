"""
Reference-checkpoint interop: maps a torch state dict saved by the
REFERENCE UNet (adell_mri/modules/segmentation/unet.py:31 — structure laid
out by init_encoder :543, init_decoder :605, init_upscale_ops :415,
init_link_ops :461, get_final_layer :626, init_bottleneck_classifier :691,
init_feature_conditioning_operations :716) onto the param tree of OUR
``models/segmentation/unet.py::UNet`` at the same YAML config.

This is the migration path for users coming from the reference ("load my
trained adell-mri U-Net on TPU") and the engine behind the
weight-transfer forward-parity tests (same weights -> same logits), the
strongest evidence for the north star's Dice-within-1% axis.

Layout conventions translated:
  - torch ConvNd weight  (O, I, *k)   -> flax kernel (*k, I, O)
  - torch ConvTransposeNd (I, O, *k)  -> flax kernel (*k, I, O)
  - torch Linear weight  (O, I)       -> flax Dense kernel (I, O)
  - torch PReLU weight (1,)           -> ActDropNorm "prelu" (1,)
  - torch BatchNorm weight/bias       -> GlobalBatchNorm scale/bias
    with running_mean/var             -> batch_stats mean/var
  - torch InstanceNorm (affine)       -> InstanceNorm scale/bias
    (the non-affine default carries no parameters on either side)

Supported config surface: conv_type {regular, resnet, depthwise, sae,
asp} — the last three land on the reference-compat _ConvUnit variants
(depthwise shares our default layout; sae/asp map onto conv_type
"sae_ref"/"asp_ref", which reproduce the reference's sum-combined scSE
and its never-downsampling ASPP encoder + center-crop decoder) —
link_type {identity, conv, residual}, upscale_type {upsample,
transpose}, optional deep supervision / bottleneck classification /
feature conditioning.
"""

from typing import Any, Dict, Mapping, Optional, Sequence

import numpy as np

from adell_mri_tpu.interop.mapping import _convT_w, _Mapper

__all__ = ["import_reference_unet_state_dict"]


def import_reference_unet_state_dict(
    state_dict: Mapping[str, np.ndarray],
    *,
    depth: Sequence[int],
    conv_type: str = "regular",
    link_type: str = "identity",
    upscale_type: str = "upsample",
    norm_type: str = "batch",
    activation_fn: str = "prelu",
    deep_supervision: bool = False,
    bottleneck_classification: bool = False,
    feature_conditioning: Optional[int] = None,
    in_channels: int = 1,
    skip_conditioning: int = 0,
    strict: bool = True,
) -> Dict[str, Any]:
    """
    Converts a reference-UNet torch ``state_dict`` (tensors as numpy
    arrays) into variables for our ``UNet`` at the same config.

    Returns ``{"params": ..., "batch_stats": ...?, "feature_conditioning_
    params": {"mean", "std"}?}`` — feed the first two to ``apply`` and the
    last to the ``feature_conditioning_params`` config field.
    """
    if conv_type not in ("regular", "resnet", "depthwise", "sae", "asp"):
        raise NotImplementedError(
            "reference-checkpoint import supports conv_type "
            f"regular/resnet/depthwise/sae/asp (got {conv_type!r})"
        )
    if link_type not in ("identity", "conv", "residual"):
        raise NotImplementedError(
            "reference-checkpoint import supports link_type "
            f"identity/conv/residual (got {link_type!r})"
        )
    m = _Mapper(state_dict, norm_type, activation_fn, strict)
    n = len(depth)

    # encoder (init_encoder :543-586): per level a stride-1 unit and, for
    # all but the last, a downsampling unit
    prev_d = in_channels
    for i in range(n):
        if conv_type == "resnet":
            m.res_unit(
                f"encoding_operations.{i}.0",
                f"enc_{i}",
                in_d=prev_d,
                out_d=depth[i],
                strided=False,
            )
            if i < n - 1:
                m.res_unit(
                    f"encoding_operations.{i}.1",
                    f"enc_ds_{i}",
                    in_d=depth[i],
                    out_d=depth[i],
                    strided=True,
                )
        else:
            enc_unit = {
                "depthwise": m.dw_unit,
                "sae": m.sae_unit,
                "asp": m.asp_unit,
            }.get(conv_type, m.conv_unit)
            enc_unit(f"encoding_operations.{i}.0", f"enc_{i}")
            if i < n - 1:
                enc_unit(f"encoding_operations.{i}.1", f"enc_ds_{i}")
        prev_d = depth[i]

    # decoder (init_decoder :605-624, init_upscale_ops :415-459,
    # init_link_ops :461-527)
    for i in range(n - 1):
        if upscale_type == "upsample":
            m.conv(f"upscale_ops.{i}.0", (f"up_{i}",))
        else:
            m.conv(f"upscale_ops.{i}", (f"up_{i}",), transpose=_convT_w)
        if link_type == "conv":
            m.conv(f"link_ops.{i}.0", (f"link_{i}",))
            m.adn(f"link_ops.{i}.1", (f"link_adn_{i}",))
        elif link_type == "residual":
            # init_link_ops :503-527: plain ResidualBlock (NO
            # inter_channels) at d (+skip-conditioning channels),
            # projected back to d only when conditioning widens the input
            m.res_block(
                f"link_ops.{i}",
                (f"link_{i}",),
                inter=False,
                project=skip_conditioning > 0,
            )
        if feature_conditioning is not None:
            # the gate MLP's ADNs are fixed at (batch, swish/sigmoid)
            # regardless of the model's norm/act
            # (init_feature_conditioning_operations :733-740)
            m.linear(f"feature_conditioning_ops.{i}.0", (f"feat_cond_{i}",))
            m.adn(
                f"feature_conditioning_ops.{i}.1",
                (f"feat_cond_adn_{i}",),
                act="swish",
                norm="batch",
            )
            m.linear(
                f"feature_conditioning_ops.{i}.2", (f"feat_cond_out_{i}",)
            )
            m.adn(
                f"feature_conditioning_ops.{i}.3",
                (f"feat_cond_out_adn_{i}",),
                act="sigmoid",
                norm="batch",
            )
        # decoder conv map (conv_op_dec, unet.py:213-246): resnet
        # decodes with REGULAR blocks, sae AND asp decode with sae,
        # depthwise with depthwise; our UNet mirrors this
        # (models/segmentation/unet.py dec_ct map)
        dec_unit = {
            "depthwise": m.dw_unit,
            "sae": m.sae_unit,
            "asp": m.sae_unit,
        }.get(conv_type, m.conv_unit)
        dec_unit(f"decoding_operations.{i}", f"dec_{i}")

    # final layer (get_final_layer :626-655): conv3 -> adn -> conv1
    m.conv("final_layer.0", ("Conv_0",))
    m.adn("final_layer.1", ("final_adn",))
    m.conv("final_layer.2", ("Conv_1",))

    if bottleneck_classification:
        m.linear("bottleneck_classifier", ("bottleneck_classifier",))
    if deep_supervision:
        # NOTE: the reference ds heads use padding=0 (get_ds_final_layer
        # :657-683) where ours pad SAME; weights transfer but border
        # behavior differs (the PL layer interpolates ds outputs to label
        # size either way)
        for i in range(n - 1):
            m.conv(f"deep_supervision_ops.{i}.0", (f"ds_conv_{i}",))
            m.adn(f"deep_supervision_ops.{i}.1", (f"ds_adn_{i}",))
            m.conv(f"deep_supervision_ops.{i}.2", (f"ds_out_{i}",))

    out: Dict[str, Any] = {"params": m.params}
    if m.batch_stats:
        out["batch_stats"] = m.batch_stats
    if feature_conditioning is not None:
        f_mean = m.take("f_mean")
        f_std = m.take("f_std")
        if f_mean is not None and f_std is not None:
            out["feature_conditioning_params"] = {
                "mean": f_mean,
                "std": f_std,
            }

    if strict:
        leftovers = [
            k
            for k in m.sd
            if k not in m.used
            and not k.endswith("num_batches_tracked")
            # EMA/teacher shadows and semi-SL heads are dropped the same
            # way the reference's own predict does (predict.py:324-341)
            and not k.startswith(("ema.", "linear_transformation"))
        ]
        if leftovers:
            raise ValueError(
                "unmapped reference parameters "
                f"({len(leftovers)}): {leftovers[:8]}..."
            )
    return out
