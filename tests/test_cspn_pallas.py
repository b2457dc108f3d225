"""Pallas fused CSPN kernel vs the jnp oracle (interpret mode on CPU;
the same kernel compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cspn_tpu.ops import cspn_ref
from cspn_tpu.ops.cspn_pallas import cspn2d_pallas


def _inputs(rng, n=2, h=13, w=17):
    guidance = rng.standard_normal((n, h, w, 8), dtype=np.float32)
    blur = rng.standard_normal((n, h, w), dtype=np.float32)
    sparse = (rng.random((n, h, w)) < 0.05).astype(np.float32) * np.abs(
        rng.standard_normal((n, h, w))
    ).astype(np.float32)
    return jnp.asarray(guidance), jnp.asarray(blur), jnp.asarray(sparse)


@pytest.mark.parametrize("norm_type", ["8sum", "8sum_abs"])
@pytest.mark.parametrize("steps", [1, 24])
def test_pallas_matches_oracle(rng, norm_type, steps):
    g, b, s = _inputs(rng)
    want = cspn_ref.cspn2d_reference(g, b, s, steps=steps, norm_type=norm_type)
    got = cspn2d_pallas(g, b, s, steps=steps, norm_type=norm_type, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_no_sparse_matches_oracle(rng):
    g, b, _ = _inputs(rng)
    want = cspn_ref.cspn2d_reference(g, b, None, steps=8)
    got = cspn2d_pallas(g, b, None, steps=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("norm_type", ["8sum", "8sum_abs"])
@pytest.mark.parametrize("steps", [1, 4, 9])
def test_pallas_grad_matches_oracle_grad(rng, norm_type, steps):
    g, b, s = _inputs(rng, n=2, h=9, w=11)

    def loss_pallas(g, b):
        return jnp.sum(
            cspn2d_pallas(g, b, s, steps=steps, norm_type=norm_type, interpret=True)
            ** 2
        )

    def loss_ref(g, b):
        return jnp.sum(
            cspn_ref.cspn2d_reference(g, b, s, steps=steps, norm_type=norm_type) ** 2
        )

    dg_p, db_p = jax.grad(loss_pallas, argnums=(0, 1))(g, b)
    dg_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(g, b)
    np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), rtol=1e-4, atol=1e-5)


def test_pallas_grad_no_sparse(rng):
    g, b, _ = _inputs(rng, n=1, h=9, w=11)

    def loss_pallas(g, b):
        return jnp.sum(cspn2d_pallas(g, b, None, steps=5, interpret=True) ** 2)

    def loss_ref(g, b):
        return jnp.sum(cspn_ref.cspn2d_reference(g, b, None, steps=5) ** 2)

    dg_p, db_p = jax.grad(loss_pallas, argnums=(0, 1))(g, b)
    dg_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(g, b)
    np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), rtol=1e-4, atol=1e-5)


def test_pallas_under_jit_and_vmap_shapes(rng):
    g, b, s = _inputs(rng, n=3, h=12, w=16)
    f = jax.jit(lambda g, b, s: cspn2d_pallas(g, b, s, steps=2, interpret=True))
    out = f(g, b, s)
    assert out.shape == (3, 12, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_vmem_guard_backward_fallback(rng, monkeypatch):
    """Images whose fused backward would overflow VMEM keep the fused
    forward but take the XLA-remat backward -- grads must still match."""
    from cspn_tpu.ops import cspn_pallas

    g, b, s = _inputs(rng, n=1, h=10, w=12)
    monkeypatch.setattr(cspn_pallas, "_VMEM_BUDGET_BYTES", 1)  # force fallback
    assert not cspn_pallas.bwd_fits_vmem(10, 12, 5)

    def loss_pallas(g, b):
        return jnp.sum(cspn2d_pallas(g, b, s, steps=5, interpret=True) ** 2)

    def loss_ref(g, b):
        return jnp.sum(cspn_ref.cspn2d_reference(g, b, s, steps=5) ** 2)

    dg_p, db_p = jax.grad(loss_pallas, argnums=(0, 1))(g, b)
    dg_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(g, b)
    np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), rtol=1e-4, atol=1e-5)


def test_vmem_guard_dispatch_fallback(rng, monkeypatch):
    """Oversized forward under 'auto'/'pallas' dispatch routes to the
    reference implementation instead of the kernel."""
    from cspn_tpu.ops import cspn, cspn_pallas

    g, b, s = _inputs(rng, n=1, h=10, w=12)
    monkeypatch.setattr(cspn_pallas, "_VMEM_BUDGET_BYTES", 1)
    monkeypatch.setattr(cspn, "_default_backend", lambda: "pallas")
    out = cspn.cspn2d(g, b, s, steps=4, backend="auto")
    want = cspn_ref.cspn2d_reference(g, b, s, steps=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("h", [40, 37])  # 37: ragged H -> zero-pad to 40
def test_tiled_forward_matches_oracle(rng, monkeypatch, h):
    """Row-tiled oversized-image path: multiple tiles with steps-row halos
    must agree with the whole-image oracle exactly (interiors are exact by
    the halo argument; every output row is an interior row of some tile)."""
    from cspn_tpu.ops import cspn, cspn_pallas

    steps = 6
    g, b, s = _inputs(rng, n=2, h=h, w=16)
    # shrink the budget so the 40-row image splits into several tiles
    # (halo rounds up to 8, so budget 32 -> tile_h 16 -> 3 tiles)
    monkeypatch.setattr(cspn_pallas, "_tiled_rows_budget", lambda w: 32)
    out = cspn_pallas.cspn2d_tiled(g, b, s, steps=steps, interpret=True)
    want = cspn_ref.cspn2d_reference(g, b, s, steps=steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6)

    # dispatch: fwd too large but tiled fits -> tiled path
    monkeypatch.setattr(cspn_pallas, "fwd_fits_vmem",
                        lambda h, w, io_bytes=4: False)
    monkeypatch.setattr(cspn, "_default_backend", lambda: "pallas")
    out2 = cspn.cspn2d(g, b, s, steps=steps, backend="auto")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_tiled_forward_grads_match_oracle(rng, monkeypatch):
    """Backward through the tiled composition (normalization in XLA + per-
    tile remat through the composed segment) matches oracle autodiff."""
    from cspn_tpu.ops import cspn_pallas

    steps = 4
    g, b, s = _inputs(rng, n=1, h=24, w=12)
    monkeypatch.setattr(cspn_pallas, "_tiled_rows_budget", lambda w: 32)

    def loss_tiled(g, b):
        return jnp.sum(
            cspn_pallas.cspn2d_tiled(g, b, s, steps=steps, interpret=True) ** 2
        )

    def loss_ref(g, b):
        return jnp.sum(cspn_ref.cspn2d_reference(g, b, s, steps=steps) ** 2)

    dg_t, db_t = jax.grad(loss_tiled, argnums=(0, 1))(g, b)
    dg_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(g, b)
    np.testing.assert_allclose(np.asarray(dg_t), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_t), np.asarray(db_r), rtol=1e-4, atol=1e-5)


def test_bwd_map_fallback_matches(rng, monkeypatch):
    """Images whose doubled grid buffers exceed VMEM use the sequential
    lax.map backward -- grads must match the grid form / oracle."""
    from cspn_tpu.ops import cspn_pallas

    g, b, s = _inputs(rng, n=2, h=9, w=11)
    monkeypatch.setattr(cspn_pallas, "bwd_grid_fits_vmem", lambda h, w, st: False)

    def loss_pallas(g, b):
        return jnp.sum(cspn2d_pallas(g, b, s, steps=4, interpret=True) ** 2)

    def loss_ref(g, b):
        return jnp.sum(cspn_ref.cspn2d_reference(g, b, s, steps=4) ** 2)

    dg_p, db_p = jax.grad(loss_pallas, argnums=(0, 1))(g, b)
    dg_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(g, b)
    np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_p), np.asarray(db_r), rtol=1e-4, atol=1e-5)


# --- bf16 HBM-I/O variant (io_dtype) ---------------------------------------


def test_bf16_io_matches_rounded_reference(rng):
    """io_dtype=bf16 computes EXACTLY the f32 function of bf16-rounded
    inputs (the kernel upcasts at first use): pin against the reference on
    pre-rounded inputs, and sanity-check it stays close to full f32."""
    g, b, s = _inputs(rng)
    gr = g.astype(jnp.bfloat16).astype(jnp.float32)
    br = b.astype(jnp.bfloat16).astype(jnp.float32)
    sr = s.astype(jnp.bfloat16).astype(jnp.float32)
    want = cspn_ref.cspn2d_reference(gr, br, sr, steps=24)
    got = cspn2d_pallas(g, b, s, steps=24, interpret=True, io_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    full = cspn_ref.cspn2d_reference(g, b, s, steps=24)
    err = np.max(np.abs(np.asarray(got) - np.asarray(full)))
    assert err < 0.05, err  # bf16 input rounding, not divergence


def test_bf16_io_dispatch_and_grads(rng):
    """cspn2d(io_dtype=bf16) is differentiable and the reference backend's
    rounded-input emulation matches the kernel's function."""
    from cspn_tpu.ops.cspn import cspn2d

    g, b, s = _inputs(rng, n=1, h=9, w=11)
    out_k = cspn2d(g, b, s, steps=6, backend="pallas", io_dtype=jnp.bfloat16)
    out_r = cspn2d(g, b, s, steps=6, backend="reference", io_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)

    def loss(g, b):
        return jnp.sum(
            cspn2d(g, b, s, steps=6, backend="pallas", io_dtype=jnp.bfloat16) ** 2
        )

    dg, db = jax.grad(loss, argnums=(0, 1))(g, b)
    assert np.isfinite(np.asarray(dg)).all() and np.isfinite(np.asarray(db)).all()


def test_bf16_io_tiled_dispatch_rounds_inputs(rng, monkeypatch):
    """When io_dtype=bf16 routes to the row-tiled path (whole-image kernel
    doesn't fit), the inputs are still rounded to the I/O dtype so every
    backend/shape class computes the same bf16-rounded function (the tiled
    DMAs themselves stay f32; ADVICE r3)."""
    from cspn_tpu.ops import cspn, cspn_pallas

    steps = 4
    g, b, s = _inputs(rng, n=1, h=24, w=16)
    monkeypatch.setattr(cspn_pallas, "_tiled_rows_budget", lambda w: 32)
    monkeypatch.setattr(cspn_pallas, "fwd_fits_vmem",
                        lambda h, w, io_bytes=4: False)
    monkeypatch.setattr(cspn, "_default_backend", lambda: "pallas")
    out = cspn.cspn2d(g, b, s, steps=steps, backend="auto",
                      io_dtype=jnp.bfloat16)
    gr = g.astype(jnp.bfloat16).astype(jnp.float32)
    br = b.astype(jnp.bfloat16).astype(jnp.float32)
    sr = s.astype(jnp.bfloat16).astype(jnp.float32)
    want = cspn_ref.cspn2d_reference(gr, br, sr, steps=steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_bf16_io_extends_whole_image_range():
    """2x704x1216 (KITTI double-height) fits the whole-image kernel under
    bf16 I/O but not under f32 (where it routes to the tiled path)."""
    from cspn_tpu.ops.cspn_pallas import fwd_fits_vmem

    assert not fwd_fits_vmem(704, 1216, 4)
    assert fwd_fits_vmem(704, 1216, 2)
    assert fwd_fits_vmem(228, 304, 4)  # f32 flagship unchanged


# --- fused halo-segment backward (spatially-sharded training path) ---------


def _seg_inputs(rng, n=2, h=12, w=18, with_keep=True):
    gates = jnp.asarray(rng.standard_normal((n, 8, h, w), dtype=np.float32)) * 0.1
    base = jnp.asarray(rng.standard_normal((n, h, w), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((n, h, w), dtype=np.float32))
    keep = None
    if with_keep:
        keep = jnp.asarray(
            (rng.random((n, h, w)) > 0.07).astype(np.float32)
        )
    return gates, base, keep, x


@pytest.mark.parametrize("with_keep", [True, False])
@pytest.mark.parametrize("k_steps", [1, 3, 6])
def test_halo_segment_fused_bwd_matches_composed(rng, with_keep, k_steps):
    """The fused in-VMEM halo-segment backward (replay + adjoint sweep)
    equals autodiff of the composed form for every cotangent path
    (gates, base, keep, x)."""
    from cspn_tpu.ops.cspn_pallas import (
        _halo_segment_bwd_pallas,
        _halo_segment_ref,
        halo_bwd_fits_vmem,
    )

    gates, base, keep, x = _seg_inputs(rng, with_keep=with_keep)
    assert halo_bwd_fits_vmem(gates.shape[2], gates.shape[3], k_steps)
    ct = jnp.asarray(
        np.random.default_rng(5).standard_normal(x.shape, dtype=np.float32)
    )

    if with_keep:
        _, vjp = jax.vjp(
            lambda g, b, k, xx: _halo_segment_ref(g, b, k, xx, k_steps),
            gates, base, keep, x,
        )
        want = vjp(ct)
    else:
        _, vjp = jax.vjp(
            lambda g, b, xx: _halo_segment_ref(g, b, None, xx, k_steps),
            gates, base, x,
        )
        dg, db, dx = vjp(ct)
        want = (dg, db, None, dx)

    got = _halo_segment_bwd_pallas(
        gates, base, keep, x, ct, k_steps, interpret=True
    )
    names = ("dgates", "dbase", "dkeep", "dx")
    for name, gv, wv in zip(names, got, want):
        if wv is None:
            assert gv is None, name
            continue
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_halo_segment_grad_dispatch_and_fallback(rng, monkeypatch):
    """cspn2d_halo_segment's custom VJP uses the fused kernel when it fits
    VMEM and the composed remat otherwise; both match the composed-form
    autodiff."""
    from cspn_tpu.ops import cspn_pallas

    gates, base, keep, x = _seg_inputs(rng, h=10, w=14)
    k_steps = 3

    def loss(g, b, k, xx):
        return jnp.sum(
            cspn_pallas.cspn2d_halo_segment(g, b, k, xx, k_steps,
                                            interpret=True) ** 2
        )

    def loss_ref(g, b, k, xx):
        return jnp.sum(cspn_pallas._halo_segment_ref(g, b, k, xx, k_steps) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 3))(gates, base, keep, x)
    got_fused = jax.grad(loss, argnums=(0, 1, 3))(gates, base, keep, x)
    monkeypatch.setattr(cspn_pallas, "halo_bwd_fits_vmem",
                        lambda he, w, k: False)
    got_remat = jax.grad(loss, argnums=(0, 1, 3))(gates, base, keep, x)
    for gf, gr, wv in zip(got_fused, got_remat, want):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(wv),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(wv),
                                   rtol=1e-4, atol=1e-5)


# --- fused paddle-semantics 2D multi-step path -----------------------------


@pytest.mark.parametrize("c", [1, 2])
@pytest.mark.parametrize("steps", [1, 6])
def test_paddle2d_fused_matches_reference(rng, c, steps):
    """cspn_nd's fused 2D kernel (paddle --dimNum=2 demo path) equals the
    XLA reference: per-pixel abs-sum normalization, running-state center
    term, raster gate order."""
    from cspn_tpu.ops import cspn_pallas

    n, h, w = 2, 12, 18
    guide = jnp.asarray(rng.standard_normal((n, h, w, 8 * c), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
    want = cspn_ref.cspn_nd_reference(guide, feat, kernel_size=3, steps=steps)
    got = cspn_pallas._cspn2d_paddle_vjp(guide, feat, steps, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_paddle2d_fused_dispatch_and_grads(rng):
    """cspn_nd_pallas routes VMEM-fitting 2D maps to the fused kernel and
    its remat backward matches reference autodiff."""
    from cspn_tpu.ops import cspn_pallas

    n, h, w, c = 1, 10, 14, 1
    guide = jnp.asarray(rng.standard_normal((n, h, w, 8 * c), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
    assert cspn_pallas.paddle2d_fits_vmem(h, w)
    out = cspn_pallas.cspn_nd_pallas(guide, feat, kernel_size=3, steps=4)
    want = cspn_ref.cspn_nd_reference(guide, feat, kernel_size=3, steps=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(g, f):
        return jnp.sum(cspn_pallas.cspn_nd_pallas(g, f, kernel_size=3, steps=4) ** 2)

    def loss_ref(g, f):
        return jnp.sum(cspn_ref.cspn_nd_reference(g, f, kernel_size=3, steps=4) ** 2)

    dg_p, df_p = jax.grad(loss_fused, argnums=(0, 1))(guide, feat)
    dg_r, df_r = jax.grad(loss_ref, argnums=(0, 1))(guide, feat)
    np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_r), rtol=1e-4, atol=1e-5)
