"""Multi-device tests on the 8-device CPU mesh: spatial halo-exchange CSPN
vs the unsharded oracle, and data-parallel sharding utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cspn_tpu.ops.cspn_ref import cspn2d_reference, cspn_nd_reference
from cspn_tpu.parallel import (
    cspn2d_spatial,
    cspn_nd_spatial,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(data=2, spatial=4)


def _inputs(seed=0, n=2, h=16, w=20):
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.standard_normal((n, h, w, 8), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((n, h, w), dtype=np.float32))
    s = jnp.asarray(
        (rng.random((n, h, w)) < 0.05).astype(np.float32)
        * np.abs(rng.standard_normal((n, h, w))).astype(np.float32)
    )
    return g, b, s


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("halo", [1, 2, 4])
@pytest.mark.parametrize("steps", [1, 5, 8])
def test_spatial_cspn_matches_oracle(mesh24, halo, steps):
    g, b, s = _inputs()
    want = cspn2d_reference(g, b, s, steps=steps)
    got = jax.jit(
        lambda g, b, s: cspn2d_spatial(
            g, b, s, mesh=mesh24, steps=steps, halo=halo
        )
    )(g, b, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_spatial_cspn_no_sparse(mesh24):
    g, b, _ = _inputs()
    want = cspn2d_reference(g, b, None, steps=6)
    got = jax.jit(
        lambda g, b: cspn2d_spatial(g, b, None, mesh=mesh24, steps=6, halo=3)
    )(g, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_spatial_cspn_abs_norm(mesh24):
    g, b, s = _inputs()
    want = cspn2d_reference(g, b, s, steps=7, norm_type="8sum_abs")
    got = jax.jit(
        lambda g, b, s: cspn2d_spatial(
            g, b, s, mesh=mesh24, steps=7, norm_type="8sum_abs", halo=2
        )
    )(g, b, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_spatial_cspn_grads_match(mesh24):
    g, b, s = _inputs(n=2, h=8, w=10)

    def loss_sharded(g, b):
        return jnp.sum(
            cspn2d_spatial(g, b, s, mesh=mesh24, steps=4, halo=2) ** 2
        )

    def loss_ref(g, b):
        return jnp.sum(cspn2d_reference(g, b, s, steps=4) ** 2)

    dg_s, db_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(g, b)
    dg_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(g, b)
    np.testing.assert_allclose(np.asarray(dg_s), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db_s), np.asarray(db_r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("halo,steps", [(1, 4), (3, 8)])
def test_spatial_cspn_3d_matches_oracle(mesh24, halo, steps):
    """Sharded 3D cost-volume CSPN (D sharded over 'spatial') vs the oracle."""
    rng = np.random.default_rng(7)
    n, d, h, w, c = 2, 8, 6, 10, 1
    guide = jnp.asarray(rng.standard_normal((n, d, h, w, 26 * c), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((n, d, h, w, c), dtype=np.float32))
    want = cspn_nd_reference(guide, feat, steps=steps)
    got = jax.jit(
        lambda g, f: cspn_nd_spatial(g, f, mesh=mesh24, steps=steps, halo=halo)
    )(guide, feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_spatial_cspn_2d_paddle_semantics(mesh24):
    """The nd sharded path also covers 2D paddle-semantics maps (C=2)."""
    rng = np.random.default_rng(11)
    n, h, w, c = 2, 16, 12, 2
    guide = jnp.asarray(rng.standard_normal((n, h, w, 8 * c), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
    want = cspn_nd_reference(guide, feat, steps=6)
    got = jax.jit(
        lambda g, f: cspn_nd_spatial(g, f, mesh=mesh24, steps=6, halo=2)
    )(guide, feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_spatial_cspn_3d_grads_match(mesh24):
    rng = np.random.default_rng(3)
    n, d, h, w, c = 2, 8, 4, 6, 1
    guide = jnp.asarray(rng.standard_normal((n, d, h, w, 26), dtype=np.float32))
    feat = jnp.asarray(rng.standard_normal((n, d, h, w, c), dtype=np.float32))

    def loss_sharded(g, f):
        return jnp.sum(cspn_nd_spatial(g, f, mesh=mesh24, steps=4, halo=2) ** 2)

    def loss_ref(g, f):
        return jnp.sum(cspn_nd_reference(g, f, steps=4) ** 2)

    dg_s, df_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(guide, feat)
    dg_r, df_r = jax.grad(loss_ref, argnums=(0, 1))(guide, feat)
    np.testing.assert_allclose(np.asarray(dg_s), np.asarray(dg_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(df_s), np.asarray(df_r), rtol=1e-4, atol=1e-5)


def test_shard_batch_and_replicate(mesh24):
    batch = {"x": np.ones((4, 6, 8), np.float32)}
    sharded = shard_batch(batch, mesh24)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    rep = replicate({"w": np.ones((3,))}, mesh24)
    assert rep["w"].sharding.spec == jax.sharding.PartitionSpec()
