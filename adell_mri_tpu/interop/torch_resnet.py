"""
Reference ResNet interop: maps torch state dicts saved by the REFERENCE
``ResNetBackbone``/``ResNet`` (adell_mri/modules/layers/res_net.py:51,327
— stem at init_layers :172-184, stages :185-209, heads :278-368) onto the
param trees of our ``models/layers/res_net.py`` modules.

The headline use-case is the reference's SSL workflow: pre-train a ResNet
with VICReg/SimSiam/BYOL, then graft its backbone into a U-Net encoder
(ref entrypoints/segmentation/train.py:659-719). With this mapper those
reference SSL checkpoints load straight into our backbone.

Same layout conventions as torch_unet.py (see interop/mapping.py).
Supported: res_type "resnet" (bottleneck ResidualBlock — what the
reference's backbone always builds, init_layers :188), batch_ensemble=0.
"""

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

from adell_mri_tpu.interop.mapping import _Mapper

__all__ = [
    "import_reference_resnet_backbone",
    "import_reference_resnet",
]


def _check_leftovers(m: _Mapper):
    """Raises when mapped-over state-dict keys were never consumed — a
    declared structure smaller than the checkpoint would otherwise
    silently drop trained weights."""
    leftovers = [
        k
        for k in m.sd
        if k not in m.used and not k.endswith("num_batches_tracked")
    ]
    if leftovers:
        raise ValueError(
            "unmapped reference parameters "
            f"({len(leftovers)}): {leftovers[:8]}..."
        )


def _res_block(
    m: _Mapper,
    tprefix: str,
    fname: str,
    in_ch: int,
    out_ch: int,
):
    """One reference bottleneck ResidualBlock2d/3d (res_blocks.py:108 —
    op = 1x1 -> adn -> kxk -> adn -> 1x1; final_op projects iff channel
    counts differ; adn_op last) -> our ResidualBlock."""
    m.conv(f"{tprefix}.op.0", (fname, "Conv_0"))
    m.adn(f"{tprefix}.op.1", (fname, "ActDropNorm_0"))
    m.conv(f"{tprefix}.op.2", (fname, "Conv_1"))
    m.adn(f"{tprefix}.op.3", (fname, "ActDropNorm_1"))
    m.conv(f"{tprefix}.op.4", (fname, "Conv_2"))
    if in_ch != out_ch:
        m.conv(f"{tprefix}.final_op", (fname, "Conv_3"))
    m.adn(f"{tprefix}.adn_op", (fname, "ActDropNorm_2"))


def import_reference_resnet_backbone(
    state_dict: Mapping[str, np.ndarray],
    *,
    structure: Sequence[Tuple[int, int, int, int]],
    norm_type: str = "batch",
    activation_fn: str = "prelu",
    torch_prefix: str = "",
    strict: bool = True,
) -> Dict[str, Any]:
    """
    Converts a reference-``ResNetBackbone`` state dict into variables for
    our ``ResNetBackbone`` at the same ``structure`` (list of
    (channels, inter_channels, kernel_size, n_blocks) stage tuples).

    ``torch_prefix`` strips a leading module path (e.g. ``"backbone."``
    for a reference ``ResNet`` checkpoint, ``"res_net.backbone."`` for
    SSL PL checkpoints).
    """
    if torch_prefix:
        state_dict = {
            k[len(torch_prefix):]: v
            for k, v in state_dict.items()
            if k.startswith(torch_prefix)
        }
    m = _Mapper(state_dict, norm_type, activation_fn, strict)

    # stem (init_layers :173-180): conv7 -> adn -> conv3 -> adn
    m.conv("input_layer.0", ("Conv_0",))
    m.adn("input_layer.1", ("ActDropNorm_0",))
    m.conv("input_layer.2", ("Conv_1",))
    m.adn("input_layer.3", ("ActDropNorm_1",))

    # stages (init_layers :185-209): max(N, 2) blocks each — first from
    # prev_inp, middles + final at inp; flax auto-names ResidualBlock_{j}
    # sequentially across ALL stages
    j = 0
    prev_inp = structure[0][0]
    for s, stage in enumerate(structure):
        inp, inter, k, n_blocks = stage
        for b in range(max(n_blocks, 2)):
            in_ch = prev_inp if b == 0 else inp
            _res_block(
                m,
                f"operations.{s}.{b}",
                f"ResidualBlock_{j}",
                in_ch,
                inp,
            )
            j += 1
        prev_inp = inp

    out: Dict[str, Any] = {"params": m.params}
    if m.batch_stats:
        out["batch_stats"] = m.batch_stats
    if strict:
        _check_leftovers(m)
    return out


def import_reference_resnet(
    state_dict: Mapping[str, np.ndarray],
    *,
    structure: Sequence[Tuple[int, int, int, int]],
    projection_head_structure: Optional[Sequence[int]] = None,
    prediction_head_structure: Optional[Sequence[int]] = None,
    norm_type: str = "batch",
    activation_fn: str = "prelu",
    head_norm_type: Optional[str] = None,
    head_activation_fn: Optional[str] = None,
    torch_prefix: str = "",
    strict: bool = True,
) -> Dict[str, Any]:
    """
    Full reference ``ResNet`` (res_net.py:327): backbone + projection head
    (Sequential(ProjectionHead, norm) — init_projection_head :357-368) +
    optional prediction head. Head ADN config may differ from the
    backbone's (the SSL factory passes its own), override via
    ``head_norm_type``/``head_activation_fn``.
    """
    if torch_prefix:
        state_dict = {
            k[len(torch_prefix):]: v
            for k, v in state_dict.items()
            if k.startswith(torch_prefix)
        }
    backbone_keys = {
        k: v for k, v in state_dict.items() if k.startswith("backbone.")
    }
    out = import_reference_resnet_backbone(
        backbone_keys,
        structure=structure,
        norm_type=norm_type,
        activation_fn=activation_fn,
        torch_prefix="backbone.",
        strict=strict,
    )
    params = {"ResNetBackbone_0": out["params"]}
    batch_stats = (
        {"ResNetBackbone_0": out["batch_stats"]}
        if "batch_stats" in out
        else {}
    )
    m = _Mapper(
        state_dict,
        head_norm_type or norm_type,
        head_activation_fn or activation_fn,
        strict,
    )

    # the backbone.* subset was mapped (and leftover-checked) by the
    # sub-importer above — mark it used here so the head leftover check
    # below covers ONLY the head keys
    for k in m.sd:
        if k.startswith("backbone."):
            m.used.add(k)

    def head(tprefix: str, fname: str, hidden: Sequence[int]):
        # ProjectionHead op: linear_{i} = Sequential(Linear, adn) for
        # hidden layers, bare final Linear (init_head :306-318) — written
        # into m.params under fname
        for i in range(len(hidden)):
            m.linear(f"{tprefix}.op.linear_{i}.0", (fname, f"Dense_{i}"))
            m.adn(
                f"{tprefix}.op.linear_{i}.1",
                (fname, f"ActDropNorm_{i}"),
            )
        m.linear(
            f"{tprefix}.op.linear_{len(hidden)}",
            (fname, f"Dense_{len(hidden)}"),
        )

    if projection_head_structure is not None:
        head(
            "projection_head.0",
            "ProjectionHead_0",
            projection_head_structure[:-1],
        )
        # trailing norm: LayerNorm by default (init_projection_head :368)
        d = projection_head_structure[-1]
        ln_w = m.take("projection_head.1.weight")
        ln_b = m.take("projection_head.1.bias")
        if ln_w is not None and ln_w.shape == (d,):
            m.params.setdefault("LayerNorm_0", {})["scale"] = ln_w
            m.params["LayerNorm_0"]["bias"] = ln_b
        elif ln_w is not None:
            # silently dropping a consumed-but-mismatched norm would ship
            # an untransferred layer — the declared head width disagrees
            # with the checkpoint
            raise ValueError(
                "projection head trailing norm has width "
                f"{ln_w.shape} but projection_head_structure[-1]={d} — "
                "the head structure does not match the checkpoint"
            )
    if prediction_head_structure is not None:
        head(
            "prediction_head",
            "ProjectionHead_1",
            prediction_head_structure[:-1],
        )

    if strict:
        _check_leftovers(m)
    params.update(m.params)
    if m.batch_stats:
        batch_stats.update(m.batch_stats)
    result: Dict[str, Any] = {"params": params}
    if batch_stats:
        result["batch_stats"] = batch_stats
    return result


def import_reference_catnet(
    state_dict: Mapping[str, np.ndarray],
    *,
    resnet_structure: Sequence[Tuple[int, int, int, int]],
    classification_structure: Optional[Sequence[int]] = None,
    norm_type: str = "batch",
    activation_fn: str = "prelu",
    strict: bool = True,
) -> Dict[str, Any]:
    """
    Reference ``CatNet`` (classification/classification.py:263 — ResNet
    backbone under ``res_net.`` plus a batch/gelu MLP head under
    ``classification_layer.0``) -> our ``CatNet``. The reference registers
    the backbone twice (``res_net`` and the ``feature_extraction`` alias,
    classification.py:357-358); the duplicate key set is dropped.

    NOTE on defaults: the reference's in-module default ADN act is PReLU
    (adn_fn.py), but its network FACTORY passes act "swish" unless the
    YAML overrides (network_factories.py:182-192) — pass whichever the
    checkpoint was trained with.
    """
    sd = {
        k: v
        for k, v in state_dict.items()
        if not k.startswith("feature_extraction.")
    }
    # strict passes through: the prefix filter inside the backbone import
    # restricts its leftover check to the res_net.* subset, so a
    # resnet_structure smaller than the checkpoint raises instead of
    # silently dropping trained stages
    out = import_reference_resnet_backbone(
        sd,
        structure=resnet_structure,
        norm_type=norm_type,
        activation_fn=activation_fn,
        torch_prefix="res_net.",
        strict=strict,
    )
    params: Dict[str, Any] = {"ResNetBackbone_0": out["params"]}
    batch_stats: Dict[str, Any] = (
        {"ResNetBackbone_0": out["batch_stats"]}
        if "batch_stats" in out
        else {}
    )

    last = resnet_structure[-1][0]
    hidden = list(classification_structure or [last] * 3)
    # head ADN is fixed at (batch, gelu, 0.1)
    # (init_classification_layer :381)
    m = _Mapper(sd, "batch", "gelu", strict)
    for k in list(m.sd):
        if k.startswith("res_net."):
            m.used.add(k)
    # MLP op layout (linear_blocks.py:83-101): Linear/adn pairs for the
    # hidden layers, then the final Linear
    for i in range(len(hidden)):
        m.linear(f"classification_layer.0.op.{2 * i}", (f"Dense_{i}",))
        m.adn(f"classification_layer.0.op.{2 * i + 1}", (f"ActDropNorm_{i}",))
    m.linear(
        f"classification_layer.0.op.{2 * len(hidden)}",
        (f"Dense_{len(hidden)}",),
    )
    if strict:
        _check_leftovers(m)
    params.update(m.params)
    if m.batch_stats:
        batch_stats.update(m.batch_stats)
    result: Dict[str, Any] = {"params": params}
    if batch_stats:
        result["batch_stats"] = batch_stats
    return result
