"""
REFERENCE ViT / ViTClassifier torch state dict -> our flax param tree.

Reference layout (vit.py:1618 `ViT` = LinearEmbedding + TransformerBlockStack;
classification.py:709 `ViTClassifier` adds the class-token/seq-pool head):

- ``embedding.positional_embedding`` [1, N, E]; ``embedding.class_token``
  [1, 1, E]; linear embed projects raw patch features through
  ``embedding.map_to_out`` = Sequential(LayerNorm, Linear) whenever the
  embedding size differs from prod(patch)*C (vit.py:533-537), conv embed
  uses ``embedding.conv``. The raw patch feature ordering is einops
  ``(x y z c)`` with tokens ordered ``(h w d)`` (vit.py:620-645) — exactly
  our LinearEmbedding's interleaved reshape, so weights map untouched.
- ``tbs.transformer_blocks.{i}``: pre-LN blocks (norm_op_1/norm_op_2), a
  fused unbiased ``mha.qkv`` Linear whose OUTPUT rows interleave per head
  as [q(a) k(a) v(h)] chunks (linear_blocks.py:305-327), per-head
  ``mha.q_norm``/``mha.k_norm`` LayerNorms, ``mha.output_layer``, and
  ``mlp.0``/``mlp.2`` Linears with an identity-norm gelu ADN between.
- classifier head ``classification_layer.0`` = MLP(dim -> dim -> nc) with
  a (layer, gelu) ADN after the hidden Linear (classification.py:741-748).

Our MultiHeadAttention keeps separate q/k/v Dense projections (bias zeroed
on import — the reference's qkv is bias-free) and `qk_norm=True` matches
the reference's per-head LayerNorms; LinearEmbedding's ``embed_norm=True``
reproduces map_to_out's LayerNorm.
"""

from typing import Any, Dict, Mapping

import numpy as np

from adell_mri_tpu.interop.mapping import _conv_w, _put


def _take(sd, used, key):
    used.add(key)
    return np.array(sd[key])


def _linear(sd, used, tkey, tree, fpath):
    _put(tree, fpath + ("kernel",), _take(sd, used, f"{tkey}.weight").T)
    if f"{tkey}.bias" in sd:
        _put(tree, fpath + ("bias",), _take(sd, used, f"{tkey}.bias"))


def _layernorm(sd, used, tkey, tree, fpath):
    _put(tree, fpath + ("scale",), _take(sd, used, f"{tkey}.weight"))
    _put(tree, fpath + ("bias",), _take(sd, used, f"{tkey}.bias"))


def _qkv_split(w: np.ndarray, n_heads: int):
    """Fused qkv weight [2a + h_total rows interleaved per head, in] ->
    three [in, heads * per] kernels in OUR heads-major column layout.
    Per-head chunk = [q(a), k(a), v(h)] (linear_blocks.py:311-323) where
    a = attention_dim // n_heads, h = hidden_dim // n_heads; attention_dim
    == hidden_dim in every reference config, so a == h == chunk // 3."""
    out_rows, _ = w.shape
    chunk = out_rows // n_heads
    if chunk % 3:
        raise ValueError(
            f"fused qkv rows {out_rows} with {n_heads} heads do not split "
            "into equal q/k/v (attention_dim != hidden_dim is unsupported)"
        )
    a = chunk // 3
    qs, ks, vs = [], [], []
    for head in range(n_heads):
        base = head * chunk
        qs.append(w[base : base + a])
        ks.append(w[base + a : base + 2 * a])
        vs.append(w[base + 2 * a : base + chunk])
    # rows [heads * a, in] -> our Dense kernel [in, heads * a]
    return (
        np.concatenate(qs, 0).T,
        np.concatenate(ks, 0).T,
        np.concatenate(vs, 0).T,
    )


def import_reference_vit_state_dict(
    sd: Mapping[str, np.ndarray],
    *,
    n_heads: int,
    n_blocks: int,
    prefix: str = "",
    classifier: bool = True,
    strict: bool = True,
) -> Dict[str, Any]:
    """Maps a reference ViT/ViTClassifier state dict onto our
    ViTClassifier (classifier=True) / ViT param tree. Requires
    n_registers == 0 and no windowing (the classifier configs the
    reference factories build, network_factories.py:229).

    NOTE: unlike the resnet/unet importers, ``strict=False`` relaxes only
    the unmapped-leftover check — a key this mapping NEEDS that is absent
    from the state dict always raises (the ViT layout has no optional
    submodules to skip, so a missing key is always a config mismatch)."""
    sd = {k[len(prefix):]: np.array(v) for k, v in sd.items()
          if k.startswith(prefix)}
    used: set = set()
    tree: Dict[str, Any] = {}
    vit_root = ("ViT_0",) if classifier else ()
    emb = vit_root + ("LinearEmbedding_0",)

    if "embedding.conv.weight" in sd:
        _put(
            tree, emb + ("Conv_0", "kernel"),
            _conv_w(_take(sd, used, "embedding.conv.weight")),
        )
        _put(
            tree, emb + ("Conv_0", "bias"),
            _take(sd, used, "embedding.conv.bias"),
        )
    elif "embedding.map_to_out.1.weight" in sd:
        _layernorm(sd, used, "embedding.map_to_out.0", tree,
                   emb + ("embed_norm",))
        _linear(sd, used, "embedding.map_to_out.1", tree, emb + ("Dense_0",))
    else:
        # identity map_to_out (embedding_size == prod(patch)*in_channels,
        # vit.py:533-537): parameter-free in the reference; our Dense gets
        # an exact identity kernel so the import still round-trips
        e_dim = sd["tbs.transformer_blocks.0.mha.qkv.weight"].shape[1]
        _put(tree, emb + ("Dense_0", "kernel"),
             np.eye(e_dim, dtype=np.float32))
        _put(tree, emb + ("Dense_0", "bias"),
             np.zeros(e_dim, np.float32))
    if "embedding.positional_embedding" in sd:
        _put(
            tree, emb + ("pos_embedding",),
            _take(sd, used, "embedding.positional_embedding"),
        )
    if "embedding.class_token" in sd:
        _put(
            tree, emb + ("class_token",),
            _take(sd, used, "embedding.class_token"),
        )
    if any(k.startswith("embedding.registers") for k in sd):
        raise ValueError(
            "n_registers > 0 is unsupported: the reference prepends "
            "registers BEFORE the class token (vit.py:874-881), ours after"
        )

    stack = vit_root + ("TransformerBlockStack_0",)
    for i in range(n_blocks):
        t = f"tbs.transformer_blocks.{i}"
        f = stack + (f"block_{i}",)
        _layernorm(sd, used, f"{t}.norm_op_1", tree, f + ("LayerNorm_0",))
        _layernorm(sd, used, f"{t}.norm_op_2", tree, f + ("LayerNorm_1",))
        mha = f + ("MultiHeadAttention_0",)
        qw, kw, vw = _qkv_split(
            _take(sd, used, f"{t}.mha.qkv.weight"), n_heads
        )
        for nm, w in (("q", qw), ("k", kw), ("v", vw)):
            _put(tree, mha + (nm, "kernel"), w)
            # the reference qkv has no bias; our Dense does — zero it
            _put(tree, mha + (nm, "bias"), np.zeros(w.shape[1], w.dtype))
        _layernorm(sd, used, f"{t}.mha.q_norm", tree, mha + ("q_norm",))
        _layernorm(sd, used, f"{t}.mha.k_norm", tree, mha + ("k_norm",))
        _linear(sd, used, f"{t}.mha.output_layer", tree, mha + ("proj",))
        # reference MLP = [Linear, act]*len(structure) + Linear, i.e. keys
        # mlp.0, mlp.2, ..., mlp.2n; ours names them Dense_0..Dense_n
        j = 0
        while f"{t}.mlp.{2 * j}.weight" in sd:
            _linear(sd, used, f"{t}.mlp.{2 * j}", tree, f + (f"Dense_{j}",))
            j += 1

    if classifier:
        head = ("MLP_0",)
        _linear(sd, used, "classification_layer.0.op.0", tree,
                head + ("Dense_0",))
        _layernorm(
            sd, used, "classification_layer.0.op.1.op.normalization", tree,
            head + ("ActDropNorm_0", "LayerNorm_0"),
        )
        _linear(sd, used, "classification_layer.0.op.2", tree,
                head + ("Dense_1",))
        if "seqpool.embedding_layer.weight" in sd:
            _linear(sd, used, "seqpool.embedding_layer", tree,
                    ("SeqPool_0", "Dense_0"))

    if strict:
        # map_to_in reverses the embedding for UNETR-style decoders; the
        # classifier forward never calls it
        leftover = {
            k for k in sd
            if k not in used and not k.startswith("embedding.map_to_in")
        }
        if leftover:
            raise KeyError(
                f"unmapped reference keys: {sorted(leftover)[:8]}"
            )
    return tree
