"""Pallas depth-to-space kernel vs the jnp reshape/transpose formulation.

The kernel is a pure permutation, so forward AND backward must be bit-exact
(not approximately equal) against the reference formulation, including the
folded output crop (reference narrow() semantics,
torch_resnet_cspn_nyu.py:176-179) and the h-blocked grid path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cspn_tpu.ops.d2s_pallas as d2s
from cspn_tpu.ops.d2s_pallas import _d2s, depth_to_space2, depth_to_space2_jnp


CASES = [
    # (n, h, w, 4C, oh, ow) -- crops exercise both even and odd sizes
    (2, 5, 7, 16, 9, 13),
    (1, 8, 10, 32, 16, 20),
    (2, 4, 4, 8, 7, 8),
    (3, 6, 5, 4, 11, 9),  # C=1 (depth head layout)
]


@pytest.mark.parametrize("case", CASES)
def test_d2s_forward_bit_exact(case):
    n, h, w, c4, oh, ow = case
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, c4)), jnp.float32)
    ref = depth_to_space2_jnp(x, oh, ow)
    got = _d2s(x, oh, ow, True)
    assert got.shape == ref.shape
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("case", CASES)
def test_d2s_grad_bit_exact(case):
    n, h, w, c4, oh, ow = case
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, h, w, c4)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((n, oh, ow, c4 // 4)), jnp.float32)
    gref = jax.grad(lambda v: jnp.vdot(depth_to_space2_jnp(v, oh, ow), t))(x)
    ggot = jax.grad(lambda v: jnp.vdot(_d2s(v, oh, ow, True), t))(x)
    assert np.array_equal(np.asarray(gref), np.asarray(ggot))


def test_d2s_bf16_and_blocked_grid(monkeypatch):
    # force the h-blocked multi-step grid (as used for large KITTI shapes)
    monkeypatch.setattr(d2s, "_BLOCK_BYTES_CAP", 4096)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 12, 64)), jnp.bfloat16)
    assert d2s._pick_hb(16, 12, 64, 2) < 16  # blocking actually engaged
    ref = depth_to_space2_jnp(x, 31, 23)
    got = _d2s(x, 31, 23, True)
    assert np.array_equal(
        np.asarray(ref, np.float32), np.asarray(got, np.float32)
    )
    f32 = jnp.float32
    t = jnp.asarray(rng.standard_normal(ref.shape), np.float32)

    def loss(fn):
        return lambda v: jnp.vdot(fn(v, 31, 23).astype(f32), t)

    gref = jax.grad(loss(depth_to_space2_jnp))(x)
    ggot = jax.grad(loss(lambda v, a, b: _d2s(v, a, b, True)))(x)
    assert np.array_equal(np.asarray(gref, np.float32), np.asarray(ggot, np.float32))


def test_dispatch_fallback_and_guards():
    # default backend is jnp (the Pallas kernel measured slower in-model);
    # backend='pallas' on CPU falls back to the identical jnp form
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 64)), jnp.float32)
    ref = np.asarray(depth_to_space2_jnp(x, 11, 15))
    assert np.array_equal(np.asarray(depth_to_space2(x, 11, 15)), ref)
    assert np.array_equal(
        np.asarray(depth_to_space2(x, 11, 15, backend="pallas")), ref
    )
    with pytest.raises(ValueError):
        depth_to_space2(x, 13, 15)  # oh > 2h
    with pytest.raises(ValueError):
        depth_to_space2(jnp.zeros((1, 2, 2, 6)), 4, 4)  # channels % 4 != 0
    with pytest.raises(ValueError):
        depth_to_space2(x, 11, 15, backend="mxu")
