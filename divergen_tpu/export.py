"""Deployment export via serialized StableHLO (``jax.export``).

TPU-native counterpart of the reference's deployment-export path
(``CenterNet2/tools/deploy/export_model.py:35-101`` +
``detectron2/export/``): where detectron2 traces the torch model into
TorchScript / Caffe2 / ONNX artifacts, the JAX-native deployment artifact
is a serialized StableHLO module produced by :mod:`jax.export` — hermetic
(the whole inference graph, including pre/post-processing that lives
inside ``CustomRCNN.apply``, in one portable file), loadable WITHOUT the
model-building code, and runnable on every platform recorded at export
time.

Two artifact layouts:

* **weights-separate** (default): the exported function takes
  ``(params, images, image_sizes)``; ship the ``.stablehlo`` file next to
  an orbax checkpoint. Re-export is never needed after fine-tuning.
* **weights-baked** (``bake_params=True``): params are closed over and
  become constants in the module — a single self-contained file, the
  moral equivalent of a frozen TorchScript bundle.

Notes on platforms: by default the module is lowered for the platform the
export runs on. Pass ``platforms=("tpu", "cpu")`` for a multi-platform
artifact — but note the Pallas fast paths (e.g. fused Swin window
attention) are selected at trace time for the current backend, so export
TPU artifacts from a TPU process (the plain-XLA fallback is what a CPU
export records).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = [
    "export_inference",
    "save_exported",
    "load_exported",
    "ExportedInference",
]


def _inference_fn(model):
    def fn(params, images, image_sizes):
        return model.apply(params, images, image_sizes, training=False)

    return fn


def export_inference(
    model,
    params: Any,
    *,
    batch: int = 1,
    height: int,
    width: int,
    platforms: Optional[Sequence[str]] = None,
    bake_params: bool = False,
) -> jax_export.Exported:
    """Export ``model.apply(..., training=False)`` at a fixed input shape.

    Detection models run at padded static sizes on TPU anyway
    (``INPUT.TEST_SIZE`` / resize-pad in the mapper), so a fixed
    ``(batch, height, width, 3)`` export matches production serving; the
    true per-image size still flows in through ``image_sizes`` exactly as
    in live inference.
    """
    fn = _inference_fn(model)
    img_spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    size_spec = jax.ShapeDtypeStruct((batch, 2), jnp.int32)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    if bake_params:
        baked = jax.tree.map(jnp.asarray, params)
        exp = jax_export.export(
            jax.jit(lambda images, sizes: fn(baked, images, sizes)), **kwargs
        )(img_spec, size_spec)
    else:
        p_spec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), params
        )
        exp = jax_export.export(jax.jit(fn), **kwargs)(p_spec, img_spec, size_spec)
    return exp


def save_exported(exp: jax_export.Exported, path: str) -> str:
    """Serialize an export to ``path`` (convention: ``*.stablehlo``)."""
    data = exp.serialize()
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


class ExportedInference:
    """A deserialized artifact. ``__call__`` mirrors the exported signature:
    ``(params, images, image_sizes)`` for weights-separate exports,
    ``(images, image_sizes)`` for weights-baked ones."""

    def __init__(self, exported: jax_export.Exported):
        self.exported = exported

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self.exported.platforms)

    @property
    def in_avals(self):
        return self.exported.in_avals

    def __call__(self, *args):
        return self.exported.call(*args)


def load_exported(path_or_bytes) -> ExportedInference:
    """Load a serialized export — no model code or config required."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    return ExportedInference(jax_export.deserialize(bytearray(data)))
