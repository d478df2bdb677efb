"""Per-worker-process state for task-based map_batches stages.

Measured (sf0.1, 32 CPUs): an actor-pool stage pays ~1.5 s of pool spin-up
per pipeline run, which dominates short analytics queries (doc_enrich:
2.0 s actor pool vs 0.55 s task-based). Ray reuses worker PROCESSES across
tasks, so a module-level cache gives the same "setup once per worker"
semantics as an actor's ``__init__`` without the pool startup:

  * ``per_worker(Cls)``  — wrap a no-arg callable class into a plain
    map_batches function; one instance per worker process.
  * ``cached_get(ref)``  — ``ray.get`` with a per-worker deserialization
    cache, for broadcast objects (lookup tables, matrices) fetched by
    closures; FIFO-bounded so long sessions don't accumulate.

Keep REAL actor pools (``map_batches(Cls, concurrency=N)``) when the state
is expensive or exclusive — model weights, GPUs, strict per-stage
concurrency control — where pool startup amortizes and isolation matters.
"""

from __future__ import annotations

from collections import OrderedDict

import ray

_INSTANCES: OrderedDict = OrderedDict()
_INSTANCES_MAX = 8  # closure-defined classes are a NEW key per query call —
# an unbounded cache would accumulate stale instances (and whatever
# broadcast state they hydrated) in every long-lived worker
_OBJECTS: OrderedDict = OrderedDict()
_OBJECTS_MAX = 8


def per_worker(cls):
    """Callable class → map_batches function with one instance per worker."""

    def fn(batch):
        inst = _INSTANCES.get(cls)
        if inst is None:
            inst = _INSTANCES.setdefault(cls, cls())
            while len(_INSTANCES) > _INSTANCES_MAX:
                _INSTANCES.popitem(last=False)
        else:
            _INSTANCES.move_to_end(cls)
        return inst(batch)

    fn.__name__ = f"per_worker_{cls.__name__}"
    return fn


def cached_get(ref: "ray.ObjectRef"):
    """ray.get with a bounded per-worker cache keyed by the object ref —
    a broadcast side is deserialized once per worker, not once per batch."""
    key = ref.hex()
    if key in _OBJECTS:
        _OBJECTS.move_to_end(key)
        return _OBJECTS[key]
    val = ray.get(ref)
    _OBJECTS[key] = val
    while len(_OBJECTS) > _OBJECTS_MAX:
        _OBJECTS.popitem(last=False)
    return val
