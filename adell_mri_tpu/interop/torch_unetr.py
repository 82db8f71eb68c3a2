"""
Reference-checkpoint interop for UNETR
(adell_mri/modules/segmentation/unetr.py:21) onto our ``UNETRRef``
reference-compat module (models/segmentation/unetr.py) — the default
``UNETR`` is a TPU-first redesign with a different geometry, so the
compat module reproduces the reference's exact structure: ViT with
linear no-projection embedding, ``first_encoder`` raw-input skip,
transpose-conv reconstruction ladders, 1x1 bottleneck reconstruction,
and the inherited UNet decoder.

Supported surface: embed_method="linear" with or without a projecting
embedding_size (the projection's map_to_out rides the ViT import, the
map_to_in Linears land on ``bn_map_in``/``rescaler_map_in_{i}``; the
reference also builds per-skip rescaler map_to_out Linears it never
executes — those are consumed and dropped), conv_type "regular",
link_type identity/conv/residual, upscale_type "transpose".
"""

from typing import Any, Dict, Mapping, Optional, Sequence

from adell_mri_tpu.interop.mapping import _convT_w, _Mapper
from adell_mri_tpu.interop.torch_vit import import_reference_vit_state_dict

__all__ = ["import_reference_unetr_state_dict"]


def import_reference_unetr_state_dict(
    state_dict: Mapping[str, Any],
    *,
    depth: Sequence[int],
    n_blocks: int,
    n_heads: int,
    return_at: Sequence[int],
    link_type: str = "identity",
    norm_type: str = "instance",
    activation_fn: str = "swish",
    strict: bool = True,
) -> Dict[str, Any]:
    vit_tree = import_reference_vit_state_dict(
        {k: v for k, v in state_dict.items() if k.startswith("vit.")},
        n_heads=n_heads,
        n_blocks=n_blocks,
        prefix="vit.",
        classifier=False,
        strict=strict,
    )

    m = _Mapper(state_dict, norm_type, activation_fn, strict=False)

    # projecting embedding (embedding_size set): the ViT embedding's
    # map_to_in feeds the bottleneck rearrange_rescale, the per-skip
    # ``rescalers`` each carry their own map_to_in (unetr.py:253-272,
    # forward :364-367); the rescalers' map_to_out Linears are BUILT but
    # never executed (LinearEmbedding always constructs both,
    # vit.py:525-537) — consume them so strict mode stays clean
    if "vit.embedding.map_to_in.weight" in m.sd:
        m.linear("vit.embedding.map_to_in", ("bn_map_in",))
        # one rescaler per depth[1:] entry, but the forward only zips
        # len(reconstruction_ops) = len(depth[1:-1]) of them against the
        # ViT intermediates — the final rescaler is dead weight too
        n_used = len(depth) - 2
        for i in range(len(depth) - 1):
            if i < n_used:
                m.linear(
                    f"rescalers.{i}.map_to_in", (f"rescaler_map_in_{i}",)
                )
            else:
                m.take(f"rescalers.{i}.map_to_in.weight")
                m.take(f"rescalers.{i}.map_to_in.bias")
            for k in (
                "map_to_out.0.weight", "map_to_out.0.bias",
                "map_to_out.1.weight", "map_to_out.1.bias",
            ):
                m.take(f"rescalers.{i}.{k}")

    def conv_block(tprefix, fprefix):
        m.conv(f"{tprefix}.0", (f"{fprefix}_Conv_0",))
        m.adn(f"{tprefix}.1", (f"{fprefix}_adn_in",))
        m.conv(f"{tprefix}.2", (f"{fprefix}_Conv_1",))

    # first encoder (init_first_encoder :276-285)
    m.adn("first_encoder.0", ("first_adn_0",))
    conv_block("first_encoder.1", "first")
    m.adn("first_encoder.2", ("first_adn_out",))

    # reconstruction ladders (init_reconstruction_ops :316-330): block i
    # holds n_skips - (i+1) transpose ops
    n_skips = len(depth) - 1
    for i, _d in enumerate(depth[1:-1]):
        n_ops = n_skips - (i + 1)
        for j in range(n_ops):
            t = f"reconstruction_ops.{i}.{j}"
            m.conv(f"{t}.0", (f"rec{i}_op{j}_up",), transpose=_convT_w)
            m.adn(f"{t}.1", (f"rec{i}_op{j}_adn_0",))
            conv_block(f"{t}.2", f"rec{i}_op{j}")
            m.adn(f"{t}.3", (f"rec{i}_op{j}_adn_1",))

    # bottleneck reconstruction: conv_block at k=1
    conv_block("bottleneck_reconstruction", "bn")

    # decoder (inherited from UNet)
    for i in range(n_skips):
        m.conv(f"upscale_ops.{i}", (f"up_{i}",), transpose=_convT_w)
        if link_type == "conv":
            m.conv(f"link_ops.{i}.0", (f"link_{i}",))
            m.adn(f"link_ops.{i}.1", (f"link_adn_{i}",))
        elif link_type == "residual":
            m.res_block(
                f"link_ops.{i}", (f"link_{i}",), inter=False, project=False
            )
        m.conv(f"decoding_operations.{i}.0.0", (f"dec_{i}_Conv_0",))
        m.adn(f"decoding_operations.{i}.0.1", (f"dec_{i}_adn_in",))
        m.conv(f"decoding_operations.{i}.0.2", (f"dec_{i}_Conv_1",))
        m.adn(f"decoding_operations.{i}.1", (f"dec_adn_{i}",))

    # final layer
    m.conv("final_layer.0", ("Conv_0",))
    m.adn("final_layer.1", ("final_adn",))
    m.conv("final_layer.2", ("Conv_1",))

    params = dict(vit_tree.get("params", vit_tree))
    params.update(m.params)
    out: Dict[str, Any] = {"params": params}
    if m.batch_stats:
        out["batch_stats"] = m.batch_stats

    if strict:
        leftovers = [
            k
            for k in m.sd
            if k not in m.used
            and not k.startswith("vit.")
            and not k.endswith("num_batches_tracked")
            and not k.startswith(("ema.", "linear_transformation"))
        ]
        if leftovers:
            raise ValueError(
                f"unmapped reference parameters ({len(leftovers)}): "
                f"{leftovers[:8]}..."
            )
    return out
