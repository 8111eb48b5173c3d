"""Shared helpers for functional model definitions.

Conv sequences are described by static specs
``(ksize, c_in, c_out, stride, padding)`` and stored as lists of
conv-block param dicts; train mode threads updated BatchNorm stats back
out functionally.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax

from yolo_tpu.ops import blocks

Spec = Tuple[int, int, int, int, int]  # (ksize, c_in, c_out, stride, padding)


def cb(ksize, c_in, c_out, stride=1, padding=0) -> Spec:
    return (ksize, c_in, c_out, stride, padding)


def init_seq(rng, specs: Sequence[Spec], batch_norm=True, dtype=None):
    keys = jax.random.split(rng, max(len(specs), 2))
    return [
        blocks.init_conv_block(k, ks, ci, co, batch_norm=batch_norm,
                               dtype=dtype)
        for k, (ks, ci, co, _, _) in zip(keys, specs)
    ]


def run_block(p, x, train, **kw):
    """conv_block that always returns (y, params)."""
    if train:
        return blocks.conv_block(p, x, train=True, **kw)
    return blocks.conv_block(p, x, **kw), p


def run_seq(plist: List, x, specs: Sequence[Spec], train,
            slope=blocks.MODEL_LEAKY_SLOPE):
    new = []
    for p, (ks, ci, co, st, pad) in zip(plist, specs):
        x, np_ = run_block(p, x, train, stride=st, padding=pad, slope=slope)
        new.append(np_)
    return x, new
