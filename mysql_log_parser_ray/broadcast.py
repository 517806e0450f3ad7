"""Per-worker-process cache for broadcast (ray.put) objects.

The canonical broadcast pattern for stateless tasks: the driver does ONE
``ray.put``, every task calls ``broadcast_get(ref)``, and each worker
process fetches/deserializes the object once instead of once per batch.
Bounded FIFO eviction so long-lived workers serving many different
broadcast objects (a driver looping over queries) don't accumulate every
dict/DataFrame ever shipped.
"""

from __future__ import annotations

from collections import OrderedDict

_CACHE: "OrderedDict" = OrderedDict()
_MAX_ENTRIES = 16


def broadcast_get(ref):
    """Resolve a ray.ObjectRef (or pass through a plain object), caching
    the deserialized value per worker process."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key in _CACHE:  # membership, not is-None: a broadcast None is valid
        _CACHE.move_to_end(key)
        return _CACHE[key]
    import ray

    obj = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
    _CACHE[key] = obj
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return obj
