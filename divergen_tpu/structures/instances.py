"""Padded, static-shape ``Instances`` pytree.

TPU-native counterpart of detectron2 ``structures/instances.py:7``. The
reference stores a *ragged* per-image list of fields whose leading dim is the
true instance count; under XLA every shape must be static, so here every field
is padded to a fixed capacity ``N`` and a boolean ``valid`` mask marks real
rows. All fields live in a dict so the structure is an ordinary JAX pytree:
it can cross jit boundaries, be vmapped over a batch axis, and be donated.

API parity with the reference: attribute get/set for fields, ``has``,
``__len__`` (capacity, static), ``num_valid`` (traced true count), ``cat``
(concatenation with re-padding is the caller's job — here it concatenates
capacities), and boolean-mask ``gather`` replacing ragged ``__getitem__``.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import Array


@jax.tree_util.register_pytree_node_class
class Instances:
    """A fixed-capacity collection of per-instance fields.

    ``image_size`` is ``(h, w)`` static aux data (like the reference's
    ``_image_size``). Fields share a common leading capacity dimension.
    """

    def __init__(self, image_size: Tuple[int, int], **fields: Array):
        object.__setattr__(self, "_image_size", tuple(image_size))
        object.__setattr__(self, "_fields", dict(fields))

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        keys = sorted(self._fields.keys())
        children = tuple(self._fields[k] for k in keys)
        return children, (self._image_size, tuple(keys))

    @classmethod
    def tree_unflatten(cls, aux, children):
        image_size, keys = aux
        return cls(image_size, **dict(zip(keys, children)))

    # -- detectron2-style field API -------------------------------------
    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self._fields[name] = value

    def __getattr__(self, name: str) -> Array:
        if name.startswith("_") or name not in self._fields:
            raise AttributeError(f"Instances has no field '{name}'")
        return self._fields[name]

    def has(self, name: str) -> bool:
        return name in self._fields

    def get(self, name: str) -> Array:
        return self._fields[name]

    def set(self, name: str, value: Array) -> "Instances":
        """Functional set — returns a new Instances (JAX is immutable-first)."""
        f = dict(self._fields)
        f[name] = value
        return Instances(self._image_size, **f)

    def get_fields(self) -> Dict[str, Array]:
        return dict(self._fields)

    def __len__(self) -> int:
        """Static capacity (the padded N), not the true count."""
        for v in self._fields.values():
            return int(v.shape[0])
        return 0

    def num_valid(self) -> Array:
        """Traced count of real instances."""
        return jnp.sum(self._fields["valid"].astype(jnp.int32))

    # -- padded-world replacements for ragged indexing -------------------
    def gather(self, indices: Array) -> "Instances":
        """Take rows by index (replaces ragged ``instances[idx]``)."""
        return Instances(
            self._image_size,
            **{k: jnp.take(v, indices, axis=0) for k, v in self._fields.items()},
        )

    def masked(self, keep: Array) -> "Instances":
        """Zero-out validity where ``keep`` is False (shape-preserving filter).

        The reference filters by boolean indexing (shrinking the tensor);
        with static shapes we instead AND the mask into ``valid`` so invalid
        rows are ignored downstream.
        """
        return self.set("valid", self._fields["valid"] & keep)

    @staticmethod
    def cat(instance_list) -> "Instances":
        """Concatenate along the capacity axis (structures/instances.py:143)."""
        first = instance_list[0]
        keys = set(first._fields.keys())
        for ins in instance_list[1:]:
            assert set(ins._fields.keys()) == keys, "field mismatch in cat"
        return Instances(
            first._image_size,
            **{
                k: jnp.concatenate([ins._fields[k] for ins in instance_list], axis=0)
                for k in keys
            },
        )

    def pad_to(self, capacity: int) -> "Instances":
        """Pad (or truncate) every field to ``capacity`` rows, invalid-padded."""
        out = {}
        for k, v in self._fields.items():
            n = v.shape[0]
            if n >= capacity:
                out[k] = v[:capacity]
            else:
                pad = [(0, capacity - n)] + [(0, 0)] * (v.ndim - 1)
                out[k] = jnp.pad(v, pad)
        return Instances(self._image_size, **out)

    def __repr__(self) -> str:
        fields = ", ".join(f"{k}:{tuple(v.shape)}" for k, v in self._fields.items())
        return f"Instances(image_size={self._image_size}, {fields})"


def empty_instances(
    image_size: Tuple[int, int],
    capacity: int,
    mask_size: Tuple[int, int] | None = None,
    with_masks: bool = False,
) -> Instances:
    """All-invalid Instances with the standard detection fields."""
    fields = dict(
        boxes=jnp.zeros((capacity, 4), jnp.float32),
        classes=jnp.zeros((capacity,), jnp.int32),
        scores=jnp.zeros((capacity,), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
    )
    if with_masks:
        h, w = mask_size if mask_size is not None else image_size
        fields["masks"] = jnp.zeros((capacity, h, w), jnp.float32)
    return Instances(image_size, **fields)
