"""User-extensible custom normalizers.

Port of the reference's registry (reference
``python/arcticdb/version_store/_custom_normalizers.py:17`` CustomNormalizer,
``:48`` CustomNormalizerRegistry, ``:76`` CompositeCustomNormalizer): a
registered normalizer can translate an arbitrary user type into something
the engine stores natively (DataFrame / Series / ndarray / nested
dict-list structure), and reads rebuild the original type.

Contract (same shape as the reference):

* ``normalize(item, **kwargs)`` returns ``None`` when the normalizer does
  not handle ``item``, else ``(normalized_item, meta)`` where ``meta`` is a
  :class:`CustomNormalizerMeta` (free-form JSON-serializable payload in
  ``meta.data``; the engine records the normalizer's fully-qualified class
  name itself).
* ``denormalize(item, norm_meta)`` rebuilds the original object from the
  stored item and that meta.
* Normalizers must be stateless; lowest priority number runs first.

Engine integration: ``Library.write`` consults the registry before its own
type dispatch; a custom-normalized symbol records ``{"custom": {...}}`` in
its version manifest's norm_meta and ``read`` returns the DENORMALIZED
original object for every output_format (like pickled/ndarray symbols,
custom-typed symbols are opaque to queries).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any


class CustomNormalizerMeta:
    """Free-form JSON-serializable payload a normalizer can stash for its
    denormalize (the analogue of the reference's protobuf
    CustomNormalizerMeta). ``class_name`` is filled by the engine."""

    def __init__(self, data: Any = None):
        self.data = data
        self.class_name: str | None = None


class CustomNormalizer(ABC):
    @abstractmethod
    def normalize(self, item, **kwargs):
        """Return None if ``item`` is not handled, else
        ``(normalized_item, CustomNormalizerMeta)``."""

    @abstractmethod
    def denormalize(self, item, norm_meta: CustomNormalizerMeta):
        """Rebuild the original object."""


def _fq_class_name(t: type) -> str:
    return f"{t.__module__}.{t.__name__}"


class CustomNormalizerRegistry:
    """Priority-ordered instances (reference keeps types and re-instantiates;
    instances are equivalent under the statelessness contract and let tests
    register closures over fixtures)."""

    def __init__(self):
        self._normalizers: dict[type, tuple[float, CustomNormalizer]] = {}

    def register(self, norm: CustomNormalizer, priority: float = 10.0):
        cls = norm.__class__
        if cls in self._normalizers:
            return False
        self._normalizers[cls] = (priority, norm)

    def normalizers(self) -> list[CustomNormalizer]:
        return [n for _, n in sorted(self._normalizers.values(),
                                     key=lambda pn: pn[0])]

    def by_class_name(self, name: str) -> CustomNormalizer | None:
        for cls, (_, n) in self._normalizers.items():
            if _fq_class_name(cls) == name:
                return n
        return None

    def clear(self):
        self._normalizers.clear()


_registry = CustomNormalizerRegistry()
register_normalizer = _registry.register
registered_normalizers = _registry.normalizers
clear_registered_normalizers = _registry.clear


def apply_custom_normalize(item) -> tuple[Any, dict] | None:
    """First registered normalizer (priority order) that accepts ``item``
    wins — returns (normalized_item, manifest-json custom meta)."""
    for n in _registry.normalizers():
        opt = n.normalize(item)
        if opt is not None:
            out, meta = opt
            if not isinstance(meta, CustomNormalizerMeta):
                raise TypeError(
                    f"{n.__class__.__name__}.normalize must return a "
                    "CustomNormalizerMeta as the second element")
            return out, {"class_name": _fq_class_name(n.__class__),
                         "data": meta.data}
    return None


def apply_custom_denormalize(item, custom: dict):
    """Rebuild via the registered normalizer recorded at write time; a
    missing registration raises (the reference's fail_on_missing_type
    behavior — silently returning the raw item would corrupt round-trips)."""
    n = _registry.by_class_name(custom["class_name"])
    if n is None:
        raise LookupError(
            f"no registered normalizer for {custom['class_name']!r}: call "
            "register_normalizer() before reading this symbol")
    meta = CustomNormalizerMeta(custom.get("data"))
    meta.class_name = custom["class_name"]
    return n.denormalize(item, meta)


def has_normalizers() -> bool:
    return bool(_registry.normalizers())
