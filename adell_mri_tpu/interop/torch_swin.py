"""
Reference-checkpoint interop for SWINUNet
(adell_mri/modules/segmentation/unetr.py:635) onto our ``SWINUNetRef``
bug-compatible module (models/segmentation/swin_ref.py — see its
docstring for the reproduced reference quirks). The default ``SWINUNet``
is a TPU-first redesign with a different geometry, so this maps onto the
compat module only.

Supported surface: embed_method "linear" (with or without a projecting
embedding_size — both map, unlike UNETR where the projection predates
the compat module) or "convolutional"; conv_type "regular"; link_type
identity/conv/residual; upscale_type "transpose".
"""

from typing import Any, Dict, Mapping, Sequence

from adell_mri_tpu.interop.mapping import _convT_w, _Mapper

__all__ = ["import_reference_swin_state_dict"]


def _map_swin_block(m: _Mapper, tprefix: str, fname: str):
    """One SWINTransformerBlock (vit.py:1004) -> one SWINRefBlock."""
    emb = f"{tprefix}.embedding"
    if f"{emb}.conv.weight" in m.sd:
        m.conv(f"{emb}.conv", (fname, "embed_conv"))
    if f"{emb}.map_to_out.0.weight" in m.sd:
        w = m.take(f"{emb}.map_to_out.0.weight")
        b = m.take(f"{emb}.map_to_out.0.bias")
        node = m.params.setdefault(fname, {}).setdefault("embed_norm", {})
        node["scale"], node["bias"] = w, b
        m.linear(f"{emb}.map_to_out.1", (fname, "embed_proj"))
    if f"{emb}.map_to_in.weight" in m.sd:
        m.linear(f"{emb}.map_to_in", (fname, "map_in"))
    if f"{emb}.positional_embedding" in m.sd:
        m.params.setdefault(fname, {})["pos_embed"] = m.take(
            f"{emb}.positional_embedding"
        )
    for tk, fk in (("norm_op_1", "norm1"), ("norm_op_2", "norm2")):
        w = m.take(f"{tprefix}.{tk}.weight")
        b = m.take(f"{tprefix}.{tk}.bias")
        node = m.params.setdefault(fname, {}).setdefault(fk, {})
        node["scale"], node["bias"] = w, b
    mha = f"{tprefix}.mha"
    qkv = m.take(f"{mha}.qkv.weight")
    node = m.params.setdefault(fname, {})
    node.setdefault("qkv", {})["kernel"] = qkv.T
    for tk, fk in (("q_norm", "qnorm"), ("k_norm", "knorm")):
        w = m.take(f"{mha}.{tk}.weight")
        b = m.take(f"{mha}.{tk}.bias")
        node.setdefault(fk, {})["scale"] = w
        node[fk]["bias"] = b
    node["rpb"] = m.take(f"{mha}.relative_position_bias_table")
    m.linear(f"{mha}.output_layer", (fname, "proj"))
    # MLP: linears at even Sequential slots (adn modules between them
    # are parameter-free identity-norm/dropout/gelu); map in index order
    mlp_idx = sorted(
        int(k.split(".")[-2])
        for k in m.sd
        if k.startswith(f"{tprefix}.mlp.op.") and k.endswith(".weight")
    )
    for j, i in enumerate(mlp_idx):
        m.linear(f"{tprefix}.mlp.op.{i}", (fname, f"mlp_{j}"))


def import_reference_swin_state_dict(
    state_dict: Mapping[str, Any],
    *,
    depth: Sequence[int],
    n_stack_blocks: Sequence[int],
    link_type: str = "identity",
    norm_type: str = "instance",
    activation_fn: str = "swish",
    strict: bool = True,
) -> Dict[str, Any]:
    """``n_stack_blocks``: blocks per stage = len(shift_sizes[stage])
    after arg_compliance (unetr.py:821-846)."""
    m = _Mapper(state_dict, norm_type, activation_fn, strict=False)

    def conv_block(tprefix, fprefix):
        m.conv(f"{tprefix}.0", (f"{fprefix}_Conv_0",))
        m.adn(f"{tprefix}.1", (f"{fprefix}_adn_in",))
        m.conv(f"{tprefix}.2", (f"{fprefix}_Conv_1",))

    # swin stages: first_swin_block.stbs.{b} + swin_blocks.{i}.stbs.{b}
    for b in range(n_stack_blocks[0]):
        _map_swin_block(m, f"first_swin_block.stbs.{b}", f"swin0_blk{b}")
    for s in range(1, len(depth)):
        for b in range(n_stack_blocks[s]):
            _map_swin_block(
                m, f"swin_blocks.{s - 1}.stbs.{b}", f"swin{s}_blk{b}"
            )

    # first encoder (init_first_encoder :847-858)
    m.adn("first_encoder.0", ("first_adn_0",))
    conv_block("first_encoder.1", "first")
    m.adn("first_encoder.2", ("first_adn_out",))

    # reconstruction ops (init_reconstruction_ops :918-938)
    m.adn("first_rec_op.0", ("rec_first_ln",), norm="layer", act="identity")
    conv_block("first_rec_op.1", "rec_first")
    m.adn("first_rec_op.2", ("rec_first_adn",))
    for i, _d in enumerate(depth[1:]):
        t = f"reconstruction_ops.{i}"
        m.adn(f"{t}.0", (f"rec{i}_ln",), norm="layer", act="identity")
        conv_block(f"{t}.1", f"rec{i}_k1")
        conv_block(f"{t}.2", f"rec{i}_k3")
        m.adn(f"{t}.3", (f"rec{i}_adn",))

    # inherited UNet decoder
    n_skips = len(depth) - 1
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

    # final layer (get_final_layer :626-655 at 2*depth[0])
    m.conv("final_layer.0", ("Conv_0",))
    m.adn("final_layer.1", ("final_adn",))
    m.conv("final_layer.2", ("Conv_1",))

    out: Dict[str, Any] = {"params": m.params}
    if m.batch_stats:
        out["batch_stats"] = m.batch_stats

    if strict:
        leftovers = [
            k
            for k in m.sd
            if k not in m.used
            and not k.endswith("num_batches_tracked")
            and not k.startswith(("ema.", "linear_transformation"))
        ]
        if leftovers:
            raise ValueError(
                f"unmapped reference parameters ({len(leftovers)}): "
                f"{leftovers[:8]}..."
            )
    return out
