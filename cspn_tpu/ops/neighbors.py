"""Neighborhood geometry shared by all CSPN variants.

The reference expresses propagation through zero-padded, direction-shifted
canvases (cspn_pytorch/models/cspn.py:85-172).  We use the equivalent *gather*
form: for an output pixel p, direction d contributes the value at source pixel
``p + offset_d`` (zero if outside the image).  The offset table below is the
gather-form equivalent of the reference's pad table and preserves its channel
order exactly (reference gate1..gate8, cspn.py:100-129):

    gate1 left-top     pad (l0,r2,t0,b2)  ->  source offset (+1, +1)
    gate2 center-top   pad (l1,r1,t0,b2)  ->  source offset (+1,  0)
    gate3 right-top    pad (l2,r0,t0,b2)  ->  source offset (+1, -1)
    gate4 left-center  pad (l0,r2,t1,b1)  ->  source offset ( 0, +1)
    gate5 right-center pad (l2,r0,t1,b1)  ->  source offset ( 0, -1)
    gate6 left-bottom  pad (l0,r2,t2,b0)  ->  source offset (-1, +1)
    gate7 center-bottom pad (l1,r1,t2,b0) ->  source offset (-1,  0)
    gate8 right-bottom pad (l2,r0,t2,b0)  ->  source offset (-1, -1)

(Each gate named "X" lives at a pixel q and pushes q's value toward q's
X-side neighbor; gathering at p therefore pulls from the opposite side.)

For n-dimensional propagation (the paddle-demo 3D CSPN), offsets are the
k^n - 1 points of the centered k-cube in raster order, center excluded.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax.numpy as jnp


def neighbor_offsets(ndim: int, kernel: int = 3) -> tuple[tuple[int, ...], ...]:
    """All k^ndim - 1 non-center offsets of a centered k-cube, raster order.

    For ndim=2, kernel=3 this reproduces the reference gate1..gate8 order:
    (-1,-1) is *gate8* in reference order, so note the 2D table used by
    `cspn2d` is `OFFSETS_2D_REFERENCE` below (reference order), while this
    function returns raster order used by the paddle-style nd op.
    """
    r = kernel // 2
    offs = [
        o
        for o in itertools.product(range(-r, r + 1), repeat=ndim)
        if any(c != 0 for c in o)
    ]
    return tuple(offs)


# Reference gate order for the 2D pytorch-semantics op (see module docstring).
OFFSETS_2D_REFERENCE: tuple[tuple[int, int], ...] = (
    (1, 1), (1, 0), (1, -1),
    (0, 1), (0, -1),
    (-1, 1), (-1, 0), (-1, -1),
)


def shift(x: jnp.ndarray, offset: Sequence[int], axes: Sequence[int]) -> jnp.ndarray:
    """Gather-shift: y[idx] = x[idx + offset] along `axes`, zero outside.

    offset[i] applies to axes[i].  Positive offset pulls from larger indices.
    """
    assert len(offset) == len(axes)
    pads = [(0, 0)] * x.ndim
    index = [slice(None)] * x.ndim
    n = None
    for off, ax in zip(offset, axes):
        ax = ax % x.ndim
        n = x.shape[ax]
        if off >= 0:
            pads[ax] = (0, off)
            index[ax] = slice(off, off + n)
        else:
            pads[ax] = (-off, 0)
            index[ax] = slice(0, n)
    return jnp.pad(x, pads)[tuple(index)]
