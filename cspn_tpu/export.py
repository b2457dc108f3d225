"""Hermetic serving-artifact export via ``jax.export`` (StableHLO).

The reference's deployable artifact is ``best_model.pth``: a pickled torch
state dict that eval.py re-materializes through the model-building Python
(``eval.py:106-118`` -- torch.load + constructor + DataParallel wrap).  A
TPU-native deployment wants a *compiler-level* artifact instead: the traced
eval graph serialized as portable StableHLO, loadable by any same-or-newer
jax runtime WITHOUT the model zoo, config system, or Flax on the serving
host.  This module packages that:

  - ``export_serving(model, variables, ...)`` traces the eval apply once
    (optionally with a symbolic batch dimension, so ONE artifact serves any
    request size) and returns a ``jax.export.Exported``;
  - ``save_artifact`` / ``load_artifact`` bundle the StableHLO bytes with
    the (optionally embedded) weights into a single msgpack file;
  - the ``export`` CLI subcommand drives it from a checkpoint.

Platform notes: the CSPN backend resolves at trace time (ops/cspn.py
``_resolve``), so an artifact exported on TPU bakes in the fused Pallas
kernel (a ``tpu_custom_call`` with the Mosaic payload) and is TPU-only,
while an artifact exported on CPU (or with ``cspn_backend='reference'``)
is pure StableHLO.  ``Exported.platforms`` records which.

The int8 serving graph exports the same way: pass the load-time weight
qcache (utils/quant.build_weight_qcache) and the artifact's callable takes
``(variables, qcache, rgbd)`` -- the quantized weights travel in the
qcache, exactly as in ``serving.DepthServer``.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_ser
from jax import export as jexport

_MAGIC = "cspn_tpu.export/1"


def export_serving(
    model,
    variables: dict,
    height: int,
    width: int,
    batch: int | None = None,
    qcache: dict | None = None,
    input_dtype=jnp.float32,
) -> jexport.Exported:
    """Trace + export the eval apply of ``model`` at a serving geometry.

    batch=None exports with a symbolic batch dimension ``b`` (one artifact,
    any request size); an int pins the batch (required if the traced graph
    ever specializes on it -- the flagship eval graph does not).
    """
    if qcache is not None:
        fn = lambda v, q, x: model.apply(dict(v, qcache=q), x)
    else:
        fn = lambda v, x: model.apply(v, x)
    if batch is None:
        (bdim,) = jexport.symbolic_shape("b")
    else:
        bdim = int(batch)
    vspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), variables
    )
    xspec = jax.ShapeDtypeStruct((bdim, height, width, 4), input_dtype)
    args = (vspec, xspec) if qcache is None else (
        vspec,
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), qcache
        ),
        xspec,
    )
    return jexport.export(jax.jit(fn))(*args)


def save_artifact(
    exported: jexport.Exported,
    path: str,
    variables: dict | None = None,
    qcache: dict | None = None,
    meta: dict | None = None,
) -> None:
    """Bundle StableHLO + (optional) weights into one msgpack file.

    With ``variables`` the file is fully hermetic: load_artifact returns
    everything needed to serve.  Without, the weights ship separately (e.g.
    the Orbax checkpoint) and the caller supplies them at call time.
    """
    payload = {
        "magic": _MAGIC,
        "stablehlo": exported.serialize(),
        "platforms": list(exported.platforms),
        "variables": (
            flax_ser.msgpack_serialize(jax.tree.map(np.asarray, variables))
            if variables is not None
            else b""
        ),
        "qcache": (
            flax_ser.msgpack_serialize(jax.tree.map(np.asarray, qcache))
            if qcache is not None
            else b""
        ),
        "meta": json.dumps(meta or {}),
    }
    with open(path, "wb") as f:
        f.write(flax_ser.msgpack_serialize(payload))


class ServingArtifact:
    """A loaded artifact: ``.call(...)`` mirrors the exported signature;
    ``.predict(rgbd)`` serves with the bundled weights (hermetic files)."""

    def __init__(self, exported, variables=None, qcache=None, platforms=(), meta=None):
        self.exported = exported
        self.variables = variables
        self.qcache = qcache
        self.platforms = tuple(platforms)
        self.meta = meta or {}

    def call(self, *args):
        return self.exported.call(*args)

    def predict(self, rgbd):
        if self.variables is None:
            raise ValueError(
                "artifact has no embedded weights; use .call(variables, [qcache,] x)"
            )
        x = jnp.asarray(rgbd)
        if self.qcache is not None:
            return self.exported.call(self.variables, self.qcache, x)
        return self.exported.call(self.variables, x)


def load_artifact(path: str) -> ServingArtifact:
    with open(path, "rb") as f:
        payload = flax_ser.msgpack_restore(f.read())
    if payload.get("magic") != _MAGIC:
        raise ValueError(f"{path} is not a {_MAGIC} artifact")
    variables = (
        flax_ser.msgpack_restore(bytes(payload["variables"]))
        if len(payload["variables"])
        else None
    )
    qcache = (
        flax_ser.msgpack_restore(bytes(payload["qcache"]))
        if len(payload["qcache"])
        else None
    )
    return ServingArtifact(
        jexport.deserialize(bytes(payload["stablehlo"])),
        variables=variables,
        qcache=qcache,
        platforms=tuple(payload["platforms"]),
        meta=json.loads(payload["meta"]),
    )
