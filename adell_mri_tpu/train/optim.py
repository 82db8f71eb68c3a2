"""
Optimizer factory.

Parity targets: adell_mri/utils/optimizer_factory.py:15 (string -> optimizer),
the per-layer LR split by parameter-name regex (segmentation/pl.py:526-564)
and body/head decoupled weight decay (classification/pl.py:483-499). Built on
optax; weight decay is masked off norm/bias parameters as the SSL trainers do
(self_supervised/pl.py:213-248).
"""

import re
from typing import Any, Callable, Dict, Optional, Union

import optax

Schedule = Union[float, Callable]

_NO_DECAY_TOKENS = ("bias", "scale", "norm", "embedding_cls", "pos_embed")


def wd_mask(params) -> Any:
    """True for leaves that should receive weight decay (not bias/norm)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path):
        names = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        return not any(tok in names for tok in _NO_DECAY_TOKENS)

    mask_flat = [decide(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def get_optimizer(
    optimizer_str: str = "sgd",
    learning_rate: Schedule = 1e-3,
    weight_decay: float = 0.0,
    momentum: float = 0.99,
    clip_norm: Optional[float] = None,
    params=None,
    exclude_norms_from_decay: bool = False,
    **kwargs,
) -> optax.GradientTransformation:
    """
    Builds an optax chain from a name. Supported: sgd (nesterov, the
    segmentation default, segmentation/pl.py:526), adam, adamw, adamax,
    nadam, radam, rmsprop, adagrad, lamb, lars.

    ``exclude_norms_from_decay``: torch decays EVERY parameter (bias and
    norm scales included), and the reference's segmentation/
    classification optimizers do exactly that — only its SSL path
    excludes norm parameters (self_supervised/pl.py:220-228). Default
    False = reference training-dynamics parity; SSL passes True.
    """
    name = optimizer_str.lower()
    mask = (
        wd_mask(params)
        if (params is not None and weight_decay and exclude_norms_from_decay)
        else None
    )

    def _l2(inner):
        # coupled L2 (torch semantics: wd*param added to the GRADIENT
        # before the adaptive update) for optimizers whose optax version
        # has no weight_decay arg — torch.optim.Adam/RMSprop/... all apply
        # it, so silently dropping it broke training-dynamics parity
        if not weight_decay:
            return inner
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask), inner
        )

    if name == "sgd":
        tx = _l2(optax.sgd(learning_rate, momentum=momentum, nesterov=True))
    elif name == "adam":
        tx = _l2(optax.adam(learning_rate, **kwargs))
    elif name == "adamw":
        tx = optax.adamw(
            learning_rate, weight_decay=weight_decay, mask=mask, **kwargs
        )
    elif name == "adamax":
        tx = _l2(optax.adamax(learning_rate, **kwargs))
    elif name == "nadam":
        tx = _l2(optax.nadam(learning_rate, **kwargs))
    elif name == "radam":
        tx = _l2(optax.radam(learning_rate, **kwargs))
    elif name == "rmsprop":
        tx = _l2(optax.rmsprop(learning_rate, momentum=momentum, **kwargs))
    elif name == "adagrad":
        tx = _l2(optax.adagrad(learning_rate, **kwargs))
    elif name == "lamb":
        tx = optax.lamb(
            learning_rate, weight_decay=weight_decay, mask=mask, **kwargs
        )
    elif name == "lars":
        tx = optax.lars(learning_rate, weight_decay=weight_decay, **kwargs)
    else:
        raise NotImplementedError(f"unknown optimizer {optimizer_str!r}")
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def accumulate_gradients(
    tx: optax.GradientTransformation, every: int
) -> optax.GradientTransformation:
    """
    Gradient accumulation: the optimizer applies once every ``every`` steps
    on the mean of the accumulated gradients (parity: Lightning
    ``accumulate_grad_batches``, entrypoints/segmentation/train.py:793).
    Identity when every <= 1. Memory cost: one grad-shaped accumulator.
    """
    if every is None or every <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=every).gradient_transformation()


def lr_scale_by_regex(
    params, patterns: Dict[str, float]
) -> optax.GradientTransformation:
    """
    Scales per-parameter updates by the first regex in ``patterns`` matching
    the parameter path (parity: encoder-LR split, segmentation/pl.py:526-564).
    """
    import jax

    compiled = [(re.compile(p), s) for p, s in patterns.items()]

    def label(path) -> str:
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        for pat, _ in compiled:
            if pat.search(names):
                return pat.pattern
        return "__default__"

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    labels = jax.tree_util.tree_unflatten(
        treedef, [label(path) for path, _ in flat]
    )
    transforms = {pat.pattern: optax.scale(s) for pat, s in compiled}
    transforms["__default__"] = optax.identity()
    return optax.multi_transform(transforms, labels)


def freeze_wrap(tx: optax.GradientTransformation, trainable_mask):
    """
    Wraps an optimizer so parameters whose mask leaf is False receive zero
    updates (parity: conditional_parameter_freezing,
    utils/torch_utils.py:119 — there requires_grad=False, here
    optax.multi_transform over a trainable/frozen label tree).
    """
    import jax

    labels = jax.tree.map(
        lambda t: "train" if t else "freeze", trainable_mask
    )
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
