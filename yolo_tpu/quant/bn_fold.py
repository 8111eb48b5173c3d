"""BatchNorm folding as a pure parameter transform.

The closed-form algebra of the reference BN-fusion pass
(conv+bn2conv.py:126-150, utils/bn_fuse.py):

    W' = W * gamma / sqrt(var + eps)        (per output channel)
    b' = beta - gamma * mean / sqrt(var + eps)   (+ gamma/std * b if the
                                                  conv had a bias)

Where the reference walks nn.Module children and mutates them in place,
here the transform maps any parameter pytree: every dict that contains a
conv weight 'w' plus a 'bn' entry is rewritten to a biased conv
{'w', 'b'} with the BN removed. The result loads directly into the
batch_norm=False model form (reference SlimYOLOv2_quantize_bnfuse).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BN_EPS = 1e-5


def _fold_one(layer: dict) -> dict:
    bn = layer["bn"]
    std_inv = 1.0 / jnp.sqrt(bn["var"].astype(jnp.float32) + _BN_EPS)
    scale = bn["gamma"] * std_inv  # [C_out]
    w = layer["w"].astype(jnp.float32) * scale  # HWIO: broadcast over O
    b = bn["beta"] - bn["gamma"] * bn["mean"] * std_inv
    if "b" in layer:
        b = b + scale * layer["b"].astype(jnp.float32)
    out = {k: v for k, v in layer.items() if k not in ("bn", "w", "b")}
    out["w"] = w.astype(layer["w"].dtype)
    out["b"] = b.astype(layer["w"].dtype)
    return out


def _fold_tree(params):
    if isinstance(params, dict):
        if "w" in params and "bn" in params:
            return _fold_one(params)
        return {k: _fold_tree(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        t = type(params)
        return t(_fold_tree(v) for v in params)
    return params


@jax.jit
def fold_batch_norm(params):
    """Recursively fold every conv+BN block in a parameter pytree.
    Jitted as one program over the whole tree — eager per-layer math
    dispatches ~6 tiny TPU ops per conv over the tunnel."""
    return _fold_tree(params)
