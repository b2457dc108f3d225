"""Core propagation operators (the TPU equivalent of the reference's L0 layer).

Public API:
    cspn2d            -- full 2D CSPN post-process (normalize + N steps + anchoring),
                         reference semantics of cspn_pytorch/models/cspn.py
    affinity_propagate -- one propagation step with externally-normalized gates,
                         reference semantics of paddle.fluid.layers.affinity_propagate
    cspn_nd           -- multi-step / multi-channel wrapper over affinity_propagate,
                         reference semantics of cspn_paddle/demo.py CSPN.cspn
"""

from cspn_tpu.ops.neighbors import neighbor_offsets, shift
from cspn_tpu.ops.cspn_ref import (
    normalize_affinity_2d,
    cspn2d_reference,
    affinity_propagate_reference,
    cspn_nd_reference,
)
from cspn_tpu.ops.cspn import cspn2d, affinity_propagate, cspn_nd

__all__ = [
    "neighbor_offsets",
    "shift",
    "normalize_affinity_2d",
    "cspn2d_reference",
    "affinity_propagate_reference",
    "cspn_nd_reference",
    "cspn2d",
    "affinity_propagate",
    "cspn_nd",
]
