"""Per-worker-process stateful TASK transforms (the pool-cap remover).

Why not actor pools for every stateful stage: a fixed ``concurrency=N``
actor pool caps the stage at N×num_cpus forever — at 32 CPUs a pool sized
for 8 leaves the stage starved, at 4 CPUs the same pool oversubscribes —
and every pipeline pays ~2 core-s of actor spawn per actor *inside* the
measured window (telemetry: the r2 replay saturated only ~13 of 32 cores,
and the r3 width sweep only ~5 of 16, with three fixed pools as the cap).

For read-mostly state that rebuilds in microseconds-to-milliseconds (JWK
ring parse + AESGCM contexts, compiled bootstrap schemas, stopword
tables), actor pools buy nothing: a plain TASK stage whose callable caches
the instance per worker process has identical semantics with zero pool
cap. Ray Data schedules as many concurrent tasks as the cluster has CPUs
(the stage scales exactly with cluster width — the property the
two-cluster-size scaling rule measures), task stages fuse into single
per-block chains (no intermediate block materialization between synth →
crypto → outbox → expand), and each long-lived Ray worker process builds
the state once on its first task, then reuses it.

Keep ACTOR pools for state that is genuinely expensive (models, big
indexes) or must not be rebuilt per process — `map_batches(Cls,
concurrency=...)` still works everywhere; this module is the cheap-state
fast path.

The cache key is a driver-generated per-pipeline nonce baked into the task
closure, so two pipelines NEVER share mutable state (e.g. ExpandJson's
widening registry): tasks of one run on one worker share the instance; a
new pipeline (new nonce) builds fresh state. The per-process cache is a
small LRU — long pytest sessions running hundreds of pipelines must not
accumulate registries.
"""

from __future__ import annotations

import uuid
from collections import OrderedDict

_CACHE: "OrderedDict[str, object]" = OrderedDict()
_CACHE_MAX = 32


def stateful_task(cls, **ctor_kwargs):
    """Wrap a callable-class batch transform into a per-worker-cached TASK
    function: ``ds.map_batches(stateful_task(Cls, config=...))`` instead of
    ``ds.map_batches(Cls, fn_constructor_kwargs=..., concurrency=N)``.

    The returned function builds ``cls(**ctor_kwargs)`` once per worker
    process (per pipeline) and delegates every batch to it."""
    nonce = uuid.uuid4().hex

    def fn(batch):
        inst = _CACHE.get(nonce)
        if inst is None:
            inst = cls(**ctor_kwargs)
            _CACHE[nonce] = inst
            while len(_CACHE) > _CACHE_MAX:
                _CACHE.popitem(last=False)
        else:
            _CACHE.move_to_end(nonce)
        return inst(batch)

    fn.__name__ = fn.__qualname__ = cls.__name__
    return fn
