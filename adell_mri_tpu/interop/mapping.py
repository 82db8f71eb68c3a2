"""
Shared torch-state-dict -> flax-param-tree mapping machinery for the
reference-checkpoint interop (see torch_unet.py for the layout
conventions and the parity-test evidence).
"""

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

def _conv_w(w: np.ndarray) -> np.ndarray:
    # (O, I, *k) -> (*k, I, O)
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    # (I, O, *k) -> (*k, I, O), with the spatial axes FLIPPED: torch's
    # ConvTranspose is the adjoint of its correlation (kernel taps enter
    # with opposite spatial sign to flax's fractionally-strided conv);
    # verified exact for the reference's kernel==stride upscaling
    nd = w.ndim - 2
    w = w[(slice(None), slice(None)) + (slice(None, None, -1),) * nd]
    return np.transpose(w, tuple(range(2, 2 + nd)) + (0, 1))


def _put(tree: Dict[str, Any], path: Sequence[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Mapper:
    def __init__(
        self,
        sd: Mapping[str, np.ndarray],
        norm_type: str,
        activation_fn: str,
        strict: bool,
    ):
        # COPY: tensor.detach().numpy() aliases live torch parameter
        # storage — without a copy, later in-place optimizer steps on the
        # source model would silently mutate the imported tree. Arrays
        # that already own their data (e.g. from load_reference_state_dict,
        # which copies at the deserialization boundary) pass through, so
        # stacked mappers over one state dict don't multiply host memory.
        self.sd = {
            k: v
            if isinstance(v, np.ndarray) and v.flags.owndata
            else np.array(v)
            for k, v in sd.items()
        }
        self.norm_type = norm_type
        self.activation_fn = activation_fn
        self.strict = strict
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.used = set()

    def take(self, key: str) -> Optional[np.ndarray]:
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        if self.strict:
            raise KeyError(f"reference state dict is missing {key!r}")
        return None

    def conv(self, tkey: str, fpath: Tuple[str, ...], transpose=_conv_w):
        w = self.take(f"{tkey}.weight")
        if w is not None:
            _put(self.params, fpath + ("kernel",), transpose(w))
        b = self.take(f"{tkey}.bias") if f"{tkey}.bias" in self.sd else None
        if b is not None:
            _put(self.params, fpath + ("bias",), b)

    def linear(self, tkey: str, fpath: Tuple[str, ...]):
        w = self.take(f"{tkey}.weight")
        if w is not None:
            _put(self.params, fpath + ("kernel",), w.T)
        b = self.take(f"{tkey}.bias")
        if b is not None:
            _put(self.params, fpath + ("bias",), b)

    def adn(
        self,
        tkey: str,
        fpath: Tuple[str, ...],
        act: Optional[str] = None,
        norm: Optional[str] = None,
    ):
        """One reference ActDropNorm (unet.py adn_fn :697 — ordering NDA,
        registered as Sequential ``op`` with named children)."""
        act = act if act is not None else self.activation_fn
        norm_type = norm if norm is not None else self.norm_type
        if act == "prelu":
            w = self.take(f"{tkey}.op.activation.weight")
            if w is not None:
                w = w.reshape(-1)
                if w.size != 1:
                    # torch PReLU(num_parameters=C): our ADN slope is the
                    # torch DEFAULT single shared scalar — refusing beats
                    # silently applying channel 0's slope everywhere
                    raise ValueError(
                        f"{tkey}: per-channel PReLU ({w.size} slopes) "
                        "cannot map onto the shared-slope ADN"
                    )
                _put(self.params, fpath + ("prelu",), w)
        nkey = f"{tkey}.op.normalization"
        if norm_type == "batch":
            w = self.take(f"{nkey}.weight")
            b = self.take(f"{nkey}.bias")
            sub = fpath + ("GlobalBatchNorm_0",)
            if w is not None:
                _put(self.params, sub + ("scale",), w)
            if b is not None:
                _put(self.params, sub + ("bias",), b)
            rm = self.take(f"{nkey}.running_mean")
            rv = self.take(f"{nkey}.running_var")
            if rm is not None:
                _put(self.batch_stats, sub + ("mean",), rm)
            if rv is not None:
                _put(self.batch_stats, sub + ("var",), rv)
            self.used.add(f"{nkey}.num_batches_tracked")
        elif norm_type == "instance_affine":
            w = self.take(f"{nkey}.weight")
            b = self.take(f"{nkey}.bias")
            sub = fpath + ("InstanceNorm_0",)
            if w is not None:
                _put(self.params, sub + ("scale",), w)
            if b is not None:
                _put(self.params, sub + ("bias",), b)
        elif norm_type == "layer":
            w = self.take(f"{nkey}.weight")
            b = self.take(f"{nkey}.bias")
            sub = fpath + ("LayerNorm_0",)
            if w is not None:
                _put(self.params, sub + ("scale",), w)
            if b is not None:
                _put(self.params, sub + ("bias",), b)
        # "instance" (non-affine) and "identity": no parameters

    def conv_unit(self, tprefix: str, fname: str):
        """Reference conv block + outer adn (conv_block_3d :260 wrapped at
        init_encoder :555-568 / init_decoder :616-621) -> our _ConvUnit."""
        self.conv(f"{tprefix}.0.0", (fname, "Conv_0"))
        self.adn(f"{tprefix}.0.1", (fname, "ActDropNorm_0"))
        self.conv(f"{tprefix}.0.2", (fname, "Conv_1"))
        self.adn(f"{tprefix}.1", (fname, "ActDropNorm_1"))

    def res_block(
        self,
        tprefix: str,
        fpath: Tuple[str, ...],
        inter: bool,
        project: bool,
    ):
        """Reference ResidualBlock2d/3d (res_blocks.py:13,108: ``op``
        Sequential + ``final_op`` projection + ``adn_op``) -> our
        ResidualBlock's auto-assigned tree (Conv_0..3 / ActDropNorm_*).
        ``inter``: the bottleneck variant (1x1 -> kxk -> 1x1, built when
        inter_channels is not None); ``project``: in != out channels."""
        t = f"{tprefix}." if tprefix else ""
        if inter:
            self.conv(f"{t}op.0", fpath + ("Conv_0",))
            self.adn(f"{t}op.1", fpath + ("ActDropNorm_0",))
            self.conv(f"{t}op.2", fpath + ("Conv_1",))
            self.adn(f"{t}op.3", fpath + ("ActDropNorm_1",))
            self.conv(f"{t}op.4", fpath + ("Conv_2",))
            proj, final_adn = "Conv_3", "ActDropNorm_2"
        else:
            self.conv(f"{t}op.0", fpath + ("Conv_0",))
            self.adn(f"{t}op.1", fpath + ("ActDropNorm_0",))
            self.conv(f"{t}op.2", fpath + ("Conv_1",))
            proj, final_adn = "Conv_2", "ActDropNorm_1"
        if project:
            self.conv(f"{t}final_op", fpath + (proj,))
        self.adn(f"{t}adn_op", fpath + (final_adn,))

    def dw_unit(self, tprefix: str, fname: str):
        """One conv_type='depthwise' unit (depthwise_conv_block_3d
        :292-307 wrapped in Sequential(unit, adn)): grouped conv ->
        adn -> 1x1 conv -> outer adn. Grouped torch weights are
        (O, 1, *k) — the generic (O, I, *k) transpose lands them on
        TpuDwConv's [*k, 1, C] layout."""
        self.conv(f"{tprefix}.0.0", (fname, "Conv_dw"))
        self.adn(f"{tprefix}.0.1", (fname, "ActDropNorm_0"))
        self.conv(f"{tprefix}.0.2", (fname, "Conv_pw"))
        self.adn(f"{tprefix}.1", (fname, "ActDropNorm_1"))

    def sae_unit(self, tprefix: str, fname: str):
        """One conv_type='sae' unit (sae_3d :387-397): conv block +
        the reference's sum-combined scSE (ConcurrentSqueezeAndExcite3d,
        self_attention.py:127-149) -> our _ConvUnit 'sae_ref'."""
        self.conv(f"{tprefix}.0.0.0", (fname, "Conv_0"))
        self.adn(f"{tprefix}.0.0.1", (fname, "ActDropNorm_0"))
        self.conv(f"{tprefix}.0.0.2", (fname, "Conv_1"))
        self.conv(
            f"{tprefix}.0.1.spatial.op.0", (fname, "scse", "spatial_conv")
        )
        self.linear(
            f"{tprefix}.0.1.channel.op.0", (fname, "scse", "channel_fc0")
        )
        self.linear(
            f"{tprefix}.0.1.channel.op.2", (fname, "scse", "channel_fc1")
        )
        self.adn(f"{tprefix}.1", (fname, "ActDropNorm_1"))

    def asp_unit(self, tprefix: str, fname: str, n_rates: int = 2):
        """One conv_type='asp' ENCODER unit (asp_3d :407-413 ->
        AtrousSpatialPyramidPooling3d, multi_resolution.py:359-417) ->
        our _ConvUnit 'asp_ref'. The branch ADNs are instance-norm by
        reference hard-coding (parameter-free unless the activation is
        prelu); the DWSep's act_op is Identity."""
        for r in range(n_rates):
            t = f"{tprefix}.0.layers.{r}"
            f = (fname, "aspp")
            self.conv(f"{t}.0", f + (f"branch{r}_conv",))
            self.adn(f"{t}.1", f + (f"branch{r}_adn_0",), norm="instance")
            self.conv(f"{t}.2.depthwise_op", f + (f"branch{r}_dw",))
            self.conv(f"{t}.2.pointwise_op", f + (f"branch{r}_pw",))
            self.adn(f"{t}.3", f + (f"branch{r}_adn_1",), norm="instance")
        self.adn(f"{tprefix}.1", (fname, "ActDropNorm_0"))

    def res_unit(
        self,
        tprefix: str,
        fname: str,
        in_d: int,
        out_d: int,
        strided: bool,
    ):
        """One conv_type='resnet' encoder/decoder unit: the reference
        wraps res_block_conv_3d (:342 — ResidualBlock, bottleneck when
        in_d > 32, + MaxPool when strided) in Sequential(unit, adn)
        (init_encoder :556-568). Our _ConvUnit nests the block as
        ResidualBlock_0 with the outer ADN auto-named ActDropNorm_0."""
        inner = f"{tprefix}.0.0" if strided else f"{tprefix}.0"
        self.res_block(
            inner,
            (fname, "ResidualBlock_0"),
            inter=in_d > 32,
            project=in_d != out_d,
        )
        self.adn(f"{tprefix}.1", (fname, "ActDropNorm_0"))




def load_reference_state_dict(path: str):
    """Deserializes a reference torch/Lightning checkpoint file into a
    numpy state dict: unwraps ``{"state_dict": ...}`` payloads, keeps
    tensor entries only, COPIES out of torch storage, and drops
    training-state keys the reference's own predict drops
    (predict.py:324-341)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = (
        payload.get("state_dict", payload)
        if isinstance(payload, dict)
        else payload
    )
    return {
        k: np.array(v.detach().cpu().numpy())
        for k, v in sd.items()
        if hasattr(v, "detach")
        and not k.startswith(("loss_fn.", "ema.", "criterion."))
    }


def detect_backbone_prefix(sd) -> str:
    """Finds the module path holding a reference ResNetBackbone inside an
    arbitrary checkpoint (SSL Lightning modules nest it at e.g.
    ``backbone.`` or ``res_net.backbone.``) by locating the stem conv."""
    marker = "input_layer.0.weight"
    for k in sd:
        if k.endswith(marker):
            return k[: -len(marker)]
    raise ValueError(
        "no ResNetBackbone found in checkpoint (missing "
        f"'*{marker}' key); keys look like: {sorted(sd)[:5]}"
    )
