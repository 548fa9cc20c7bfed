"""Warm-task-pool execution for stage classes.

Ray actor pools cost ~2.5 s of startup per `map_batches(Cls, ...)` stage
in this environment (measured; see BENCH/BASELINE.md) — the right trade
for stages that load a heavyweight model once per worker (the reference's
sessions-in-__init__ pattern, ``samples/python/bge_m3_embedder.py:36-50``),
but pure overhead for stages whose only state is a tokenizer or a small
seed matrix. ``task_stage`` runs such a class on the plain TASK pool:
worker processes persist across tasks, so the instance is constructed
once per (worker, config) and cached at module level — actor-pool
semantics without actor-pool startup.

Use ``map_batches(Cls, concurrency=N)`` directly when ``__init__`` is
genuinely expensive; use ``map_batches(task_stage(Cls, **kw))`` when it
is not.
"""

from __future__ import annotations

_INSTANCE_CACHE: dict = {}


def task_stage(cls, **kwargs):
    """A picklable plain function wrapping ``cls(**kwargs).__call__`` with
    a per-worker-process instance cache."""
    key = (cls.__module__, cls.__qualname__,
           tuple(sorted(kwargs.items(), key=lambda kv: kv[0])))

    def fn(batch, _cls=cls, _kw=kwargs, _key=key):
        inst = _INSTANCE_CACHE.get(_key)
        if inst is None:
            if len(_INSTANCE_CACHE) > 64:   # bound long-lived worker memory
                _INSTANCE_CACHE.clear()
            inst = _cls(**_kw)
            _INSTANCE_CACHE[_key] = inst
        return inst(batch)

    fn.__name__ = f"task_{cls.__name__}"
    return fn
