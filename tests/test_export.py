"""Serving-artifact export (cspn_tpu/export.py).

Contracts pinned here:
  - StableHLO roundtrip parity: a deserialized artifact reproduces the live
    ``model.apply`` output (fixed AND symbolic batch);
  - the int8 serving graph exports identically (qcache travels as an input);
  - single-file bundling: save/load with embedded weights serves hermetically
    via ``.predict``; --no-embed artifacts refuse ``.predict`` and serve via
    ``.call(variables, ...)``;
  - the ``export`` CLI writes a loadable artifact from a config/checkpoint.

Reference analog: the deployable artifact of the reference is
best_model.pth + the model-building Python (eval.py:106-118); here the
artifact is the compiled graph itself.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cspn_tpu.export import export_serving, load_artifact, save_artifact
from cspn_tpu.models.unet import cspn_unet_resnet18


@pytest.fixture(scope="module")
def tiny_export():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 96, 4)), jnp.float32
    )
    model = cspn_unet_resnet18(cspn_steps=2, cspn_backend="reference")
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_fixed_batch_roundtrip(tiny_export):
    model, variables, x = tiny_export
    exp = export_serving(model, variables, 64, 96, batch=2)
    back = jax.export.deserialize(exp.serialize())
    want = model.apply(variables, x)
    got = back.call(variables, x)
    # recompilation can reorder reductions; parity is float-noise level
    assert jnp.max(jnp.abs(want - got)) < 1e-4


def test_symbolic_batch_serves_any_size(tiny_export):
    model, variables, x = tiny_export
    exp = export_serving(model, variables, 64, 96, batch=None)
    back = jax.export.deserialize(exp.serialize())
    want = model.apply(variables, x)
    for n in (1, 2, 5):
        xs = jnp.concatenate([x] * ((n + 1) // 2))[:n]
        got = back.call(variables, xs)
        assert got.shape == (n, 64, 96)
        assert jnp.max(jnp.abs(want[: min(n, 2)] - got[: min(n, 2)])) < 1e-4


def test_int8_qcache_export_matches_direct_apply(tiny_export):
    _, variables, x = tiny_export
    from cspn_tpu.utils.quant import build_weight_qcache

    qmodel = cspn_unet_resnet18(cspn_steps=2, cspn_backend="reference", quant=True)
    qcache = build_weight_qcache(qmodel, variables, x)
    exp = export_serving(qmodel, variables, 64, 96, batch=2, qcache=qcache)
    want = qmodel.apply(dict(variables, qcache=qcache), x)
    got = exp.call(variables, qcache, x)
    assert jnp.max(jnp.abs(want - got)) < 1e-4


def test_artifact_file_hermetic_predict(tiny_export, tmp_path):
    model, variables, x = tiny_export
    exp = export_serving(model, variables, 64, 96, batch=None)
    path = str(tmp_path / "model.cspn")
    save_artifact(exp, path, variables=variables, meta={"arch": "resnet18"})
    art = load_artifact(path)
    assert art.meta["arch"] == "resnet18"
    assert art.platforms == exp.platforms
    want = model.apply(variables, x)
    got = art.predict(np.asarray(x))
    assert jnp.max(jnp.abs(want - got)) < 1e-4


def test_artifact_no_embed_requires_caller_weights(tiny_export, tmp_path):
    model, variables, x = tiny_export
    exp = export_serving(model, variables, 64, 96, batch=2)
    path = str(tmp_path / "graph_only.cspn")
    save_artifact(exp, path)
    art = load_artifact(path)
    with pytest.raises(ValueError, match="no embedded weights"):
        art.predict(x)
    want = model.apply(variables, x)
    assert jnp.max(jnp.abs(want - art.call(variables, x))) < 1e-4


def test_load_artifact_rejects_foreign_file(tmp_path):
    p = tmp_path / "junk.cspn"
    p.write_bytes(b"not an artifact")
    with pytest.raises(Exception):
        load_artifact(str(p))


def test_cli_export_synthetic(tmp_path, capsys):
    # end-to-end CLI: config -> (random-fallback) checkpoint -> artifact
    # file -> reload + parity check
    from cspn_tpu.cli import main

    out = tmp_path / "model.cspn"
    main([
        "export", "--preset", "synthetic_smoke", "--cspn-step", "2",
        "--cspn-backend", "reference", "--best-model-dir", str(tmp_path),
        "--out", str(out), "--batch", "1", "--check",
    ])
    msg = capsys.readouterr().out
    assert "roundtrip check" in msg
    art = load_artifact(str(out))
    h, w = art.meta["height"], art.meta["width"]
    pred = art.predict(np.zeros((1, h, w, 4), np.float32))
    assert pred.shape == (1, h, w) and np.isfinite(pred).all()
