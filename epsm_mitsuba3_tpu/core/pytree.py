"""Pytree dataclass helper.

Everything in the framework that flows through ``jax.jit`` is a pytree
dataclass created with :func:`pytree_dataclass`.  Fields marked
``static_field()`` become auxiliary (hashable) data that participates in the
jit cache key — the TPU-native replacement for the reference's C++ object
graph (src/core/object.cpp, class.cpp): structure is static, arrays are leaves.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

_STATIC = "__epsm_static__"


def static_field(**kwargs: Any) -> Any:
    """Mark a dataclass field as static (part of jit cache key, not traced)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type) -> type:
    """Decorator: make ``cls`` a frozen dataclass registered as a JAX pytree."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get(_STATIC, False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
