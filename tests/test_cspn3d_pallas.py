"""Fused segmented 3D CSPN kernel vs the jnp reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cspn_tpu.ops.cspn_ref import affinity_propagate_reference, cspn_nd_reference
from cspn_tpu.ops.cspn3d_pallas import affinity_propagate3d_fused, cspn3d_fused


def _norm_gates(rng, n, d, h, w):
    g = rng.random((n, 26, d, h, w), dtype=np.float32)
    return g / g.sum(axis=1, keepdims=True)


@pytest.mark.parametrize("steps,k", [(1, 4), (4, 4), (6, 4), (5, 2)])
def test_fused3d_matches_reference(rng, steps, k):
    n, d, h, w = 1, 5, 12, 16
    gates = jnp.asarray(_norm_gates(rng, n, d, h, w))
    feat = jnp.asarray(rng.standard_normal((n, d, h, w), dtype=np.float32))

    ref = feat[..., None]
    gates_cl = jnp.moveaxis(gates, 1, -1)
    for _ in range(steps):
        ref = affinity_propagate_reference(ref, gates_cl)
    want = np.asarray(ref[..., 0])

    got = affinity_propagate3d_fused(
        feat, gates, steps=steps, k_per_segment=k, h_tile=4, interpret=True
    )
    # gates travel as bf16 in the fused kernel
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)


def test_fused3d_h_not_divisible(rng):
    n, d, h, w = 1, 4, 10, 16  # h=10 with h_tile=4 -> padding path
    gates = jnp.asarray(_norm_gates(rng, n, d, h, w))
    feat = jnp.asarray(rng.standard_normal((n, d, h, w), dtype=np.float32))
    ref = feat[..., None]
    gates_cl = jnp.moveaxis(gates, 1, -1)
    for _ in range(3):
        ref = affinity_propagate_reference(ref, gates_cl)
    got = affinity_propagate3d_fused(
        feat, gates, steps=3, k_per_segment=2, h_tile=4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[..., 0]), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("steps", [1, 4, 6])
def test_fused3d_bwd_matches_autodiff(rng, steps):
    """Fused whole-volume backward kernel vs autodiff of the jnp reference
    (fixed normalized gates; interpret mode)."""
    import jax

    from cspn_tpu.ops.cspn3d_pallas import affinity_propagate3d_fused_bwd

    n, d, h, w = 1, 4, 8, 16
    gates = jnp.asarray(_norm_gates(rng, n, d, h, w))
    feat = jnp.asarray(rng.standard_normal((n, d, h, w), dtype=np.float32))
    ct = jnp.asarray(rng.standard_normal((n, d, h, w), dtype=np.float32))

    def ref_prop(g, x):
        y = x[..., None]
        g_cl = jnp.moveaxis(g, 1, -1)
        for _ in range(steps):
            y = affinity_propagate_reference(y, g_cl)
        return y[..., 0]

    _, vjp = jax.vjp(ref_prop, gates, feat)
    want_wbar, want_xbar = vjp(ct)

    got_wbar, got_xbar = affinity_propagate3d_fused_bwd(
        feat, gates, ct, steps=steps, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_xbar), np.asarray(want_xbar), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_wbar), np.asarray(want_wbar), rtol=2e-2, atol=3e-2
    )


def test_fused3d_bwd_padded_shape(rng):
    """Backward with H/W not tile-aligned (exercises the pad/crop path)."""
    import jax

    from cspn_tpu.ops.cspn3d_pallas import affinity_propagate3d_fused_bwd

    n, d, h, w = 1, 3, 6, 10
    gates = jnp.asarray(_norm_gates(rng, n, d, h, w))
    feat = jnp.asarray(rng.standard_normal((n, d, h, w), dtype=np.float32))
    ct = jnp.asarray(rng.standard_normal((n, d, h, w), dtype=np.float32))

    def ref_prop(g, x):
        y = x[..., None]
        g_cl = jnp.moveaxis(g, 1, -1)
        for _ in range(3):
            y = affinity_propagate_reference(y, g_cl)
        return y[..., 0]

    _, vjp = jax.vjp(ref_prop, gates, feat)
    want_wbar, want_xbar = vjp(ct)
    got_wbar, got_xbar = affinity_propagate3d_fused_bwd(
        feat, gates, ct, steps=3, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_xbar), np.asarray(want_xbar), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(got_wbar), np.asarray(want_wbar), rtol=2e-2, atol=3e-2
    )


def test_cspn_nd_fast_path_grads_match_reference(rng):
    """End-to-end grads of the fused nd fast path (raw guide -> normalized
    gates -> propagation) vs autodiff of cspn_nd_reference."""
    import jax

    from cspn_tpu.ops.cspn_pallas import cspn_nd_pallas

    n, d, h, w, c = 1, 4, 8, 16, 1
    guide = jnp.asarray(
        rng.standard_normal((n, d, h, w, c * 26), dtype=np.float32)
    )
    feat = jnp.asarray(rng.standard_normal((n, d, h, w, c), dtype=np.float32))

    def loss_fast(g, f):
        return jnp.sum(cspn_nd_pallas(g, f, steps=4) ** 2)

    def loss_ref(g, f):
        return jnp.sum(cspn_nd_reference(g, f, steps=4) ** 2)

    gg, gf = jax.grad(loss_fast, argnums=(0, 1))(guide, feat)
    wg, wf = jax.grad(loss_ref, argnums=(0, 1))(guide, feat)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(wf), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(wg), rtol=2e-2, atol=3e-2)


def test_cspn3d_fused_module_matches_reference(rng):
    n, d, h, w, c = 1, 4, 8, 16, 1
    guide = jnp.asarray(rng.random((n, d, h, w, c * 26), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((n, d, h, w, c), dtype=np.float32))
    want = cspn_nd_reference(guide, feat, steps=4)
    got = cspn3d_fused(guide, feat, steps=4, k_per_segment=2, h_tile=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )
