"""Unit tests for the jnp CSPN reference ops against an independent numpy
transcription of the padded-canvas algorithm, plus property tests
(SURVEY.md §4 test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle_numpy
from cspn_tpu.ops import (
    affinity_propagate_reference,
    cspn2d_reference,
    cspn_nd_reference,
    neighbor_offsets,
    normalize_affinity_2d,
)


def _rand_inputs(rng, n=2, h=13, w=17, signed=True):
    guidance = rng.standard_normal((n, 8, h, w), dtype=np.float32)
    if not signed:
        guidance = np.abs(guidance)
    blur = rng.standard_normal((n, h, w), dtype=np.float32)
    sparse = (rng.random((n, h, w)) < 0.05).astype(np.float32) * rng.random(
        (n, h, w)
    ).astype(np.float32)
    return guidance, blur, sparse


@pytest.mark.parametrize("norm_type", ["8sum", "8sum_abs"])
@pytest.mark.parametrize("steps", [1, 3, 24])
def test_cspn2d_matches_padded_canvas_oracle(rng, norm_type, steps):
    guidance, blur, sparse = _rand_inputs(rng)
    want = oracle_numpy.cspn2d(guidance, blur, sparse, steps=steps, norm_type=norm_type)
    got = cspn2d_reference(
        jnp.asarray(np.moveaxis(guidance, 1, -1)),
        jnp.asarray(blur),
        jnp.asarray(sparse),
        steps=steps,
        norm_type=norm_type,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("norm_type", ["8sum", "8sum_abs"])
def test_cspn2d_no_sparse(rng, norm_type):
    guidance, blur, _ = _rand_inputs(rng)
    want = oracle_numpy.cspn2d(guidance, blur, None, steps=5, norm_type=norm_type)
    got = cspn2d_reference(
        jnp.asarray(np.moveaxis(guidance, 1, -1)),
        jnp.asarray(blur),
        None,
        steps=5,
        norm_type=norm_type,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_zero_steps_is_identity(rng):
    guidance, blur, sparse = _rand_inputs(rng)
    got = cspn2d_reference(
        jnp.asarray(np.moveaxis(guidance, 1, -1)), jnp.asarray(blur),
        jnp.asarray(sparse), steps=0,
    )
    np.testing.assert_array_equal(np.asarray(got), blur)


def test_sparse_pixels_anchored_exactly(rng):
    guidance, blur, sparse = _rand_inputs(rng)
    got = np.asarray(
        cspn2d_reference(
            jnp.asarray(np.moveaxis(guidance, 1, -1)), jnp.asarray(blur),
            jnp.asarray(sparse), steps=24,
        )
    )
    mask = sparse > 0
    # anchoring resets masked pixels to the *blur* value after every step
    np.testing.assert_array_equal(got[mask], blur[mask])


def test_normalized_gate_sum_bounded(rng):
    guidance, _, _ = _rand_inputs(rng)
    gates, center = normalize_affinity_2d(jnp.asarray(np.moveaxis(guidance, 1, -1)))
    s = np.asarray(jnp.sum(jnp.abs(gates), axis=-1))
    assert (s <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(
        np.asarray(center), 1.0 - np.asarray(jnp.sum(gates, -1)), rtol=1e-6
    )


def test_abs_norm_is_convex_combination(rng):
    """With 8sum_abs, gates >= 0, sum(gates) == 1 (interior), center == 0,
    so the result stays inside [min, max] of the initial depth."""
    guidance, blur, _ = _rand_inputs(rng)
    blur = np.abs(blur)
    gates, center = normalize_affinity_2d(
        jnp.asarray(np.moveaxis(guidance, 1, -1)), "8sum_abs"
    )
    g = np.asarray(gates)
    assert (g >= 0).all()
    got = np.asarray(
        cspn2d_reference(
            jnp.asarray(np.moveaxis(guidance, 1, -1)), jnp.asarray(blur),
            None, steps=24, norm_type="8sum_abs",
        )
    )
    assert got.min() >= blur.min() - 1e-5 and got.max() <= blur.max() + 1e-5


def test_gradients_flow(rng):
    guidance, blur, sparse = _rand_inputs(rng, n=1, h=9, w=11)
    g = jnp.asarray(np.moveaxis(guidance, 1, -1))
    b = jnp.asarray(blur)

    def loss(g, b):
        return jnp.sum(cspn2d_reference(g, b, jnp.asarray(sparse), steps=4) ** 2)

    lg, lb = jax.grad(loss, argnums=(0, 1))(g, b)
    assert np.isfinite(np.asarray(lg)).all()
    assert np.isfinite(np.asarray(lb)).all()
    assert np.abs(np.asarray(lg)).sum() > 0
    assert np.abs(np.asarray(lb)).sum() > 0


# ---------------------------------------------------------------------------
# paddle-semantics nd op
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ndim,shape", [(2, (7, 9)), (3, (5, 6, 7))])
def test_affinity_propagate_matches_numpy(rng, ndim, shape):
    n = 2
    offsets = neighbor_offsets(ndim)
    d = len(offsets)
    gates = rng.random((n, d, *shape), dtype=np.float32)
    gates = gates / gates.sum(axis=1, keepdims=True)
    feat = rng.standard_normal((n, *shape), dtype=np.float32)
    want = oracle_numpy.affinity_propagate_nd(feat, gates, offsets)
    got = affinity_propagate_reference(
        jnp.asarray(feat)[..., None], jnp.asarray(np.moveaxis(gates, 1, -1))
    )[..., 0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_affinity_propagate_uniform_gates_preserve_constant(rng):
    """Constant field is a fixed point when gates are normalized (interior)."""
    offsets = neighbor_offsets(2)
    gates = np.full((1, len(offsets), 8, 8), 1 / 8, dtype=np.float32)
    feat = np.full((1, 8, 8, 1), 3.5, dtype=np.float32)
    out = np.asarray(
        affinity_propagate_reference(jnp.asarray(feat), jnp.asarray(np.moveaxis(gates, 1, -1)))
    )
    # interior pixels see all 8 neighbors
    np.testing.assert_allclose(out[0, 1:-1, 1:-1, 0], 3.5, rtol=1e-6)


@pytest.mark.parametrize("c", [1, 2])
def test_cspn_nd_3d_runs_and_differentiable(rng, c):
    shape = (4, 6, 8)
    n_g = 26
    guide = jnp.asarray(rng.random((1, *shape, c * n_g), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((1, *shape, c), dtype=np.float32))
    out = cspn_nd_reference(guide, feat, steps=3)
    assert out.shape == feat.shape
    g = jax.grad(lambda f: jnp.mean(cspn_nd_reference(guide, f, steps=3)))(feat)
    assert np.isfinite(np.asarray(g)).all()


def test_cspn_nd_channel_slicing_matches_independent_runs(rng):
    """C>1 must behave exactly like running each channel with its gate group."""
    shape = (6, 7)
    n_g = 8
    guide = jnp.asarray(rng.random((1, *shape, 2 * n_g), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((1, *shape, 2), dtype=np.float32))
    full = cspn_nd_reference(guide, feat, steps=4)
    for ch in range(2):
        single = cspn_nd_reference(
            guide[..., ch * n_g : (ch + 1) * n_g], feat[..., ch : ch + 1], steps=4
        )
        np.testing.assert_allclose(
            np.asarray(full[..., ch : ch + 1]), np.asarray(single), rtol=1e-6
        )


def test_parity_helpers():
    """normalize_gate / max_of_{4,8}_tensor (reference cspn.py:175-194)."""
    from cspn_tpu.ops.cspn_ref import max_of_4_tensor, max_of_8_tensor, normalize_gate

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((3, 4, 5, 2)), jnp.float32)
    g1, g2 = normalize_gate(g)
    np.testing.assert_allclose(
        np.abs(np.asarray(g1)) + np.abs(np.asarray(g2)), 1.0, rtol=1e-5
    )
    maps = [jnp.asarray(rng.standard_normal((4, 5)), jnp.float32) for _ in range(8)]
    np.testing.assert_array_equal(
        np.asarray(max_of_4_tensor(*maps[:4])),
        np.max(np.stack([np.asarray(m) for m in maps[:4]]), axis=0),
    )
    np.testing.assert_array_equal(
        np.asarray(max_of_8_tensor(*maps)),
        np.max(np.stack([np.asarray(m) for m in maps]), axis=0),
    )
