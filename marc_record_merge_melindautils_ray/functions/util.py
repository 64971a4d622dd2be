"""Small shared helpers."""

from __future__ import annotations

import ray


def sanitize_list_cols(df, cols):
    """Rewrite list-valued pandas columns so their cells are Python lists.

    Arrow list columns arrive in pandas as numpy-ndarray cells; pyarrow's
    pandas→Arrow conversion then mis-detects them as (variable-shaped) tensor
    columns and fails.  Plain Python lists round-trip as proper ListArrays.
    """
    import numpy as np

    for c in cols:
        if c in df.columns:
            vals = df[c].to_numpy()
            tmp = np.empty(len(vals), dtype=object)
            tmp[:] = [list(v) if v is not None and not _is_na(v) else None for v in vals]
            df[c] = tmp
    return df


def _is_na(v) -> bool:
    return v is None or (not hasattr(v, "__len__") and v != v)  # scalar NaN


def maybe_get(ref):
    """Resolve a value that may arrive either as a ``ray.ObjectRef`` (closure
    capture keeps refs as refs) or already dereferenced (Ray resolves refs
    passed as direct task/actor arguments)."""
    if isinstance(ref, ray.ObjectRef):
        return ray.get(ref)
    return ref


# ---------------------------------------------------------------------------
# Task-pool stages with per-worker-process cached state
# ---------------------------------------------------------------------------
# An actor-pool ``map_batches(Cls, ...)`` forks a fresh Python process per
# actor (full interpreter + numpy/pandas/pyarrow imports, ~1 s each) even
# when the stage's only state is a lookup index built from broadcast
# object-store refs.  For those stages a plain *task* function on the warm
# worker pool is strictly better: tasks reuse already-imported processes, and
# the index is built once per participating worker (keyed by the broadcast
# refs) instead of once per actor.  Construction cost and copy count stay
# bounded exactly like the actor pool — one instance per process — while the
# per-stage fixed cost drops from ~1 s × pool-width to ~ms.
#
# Keep REAL actor pools for stages with heavy or resource-bounded state
# (decoded-payload caches, model weights): an actor pool caps the number of
# live copies at the pool width; the task path caps it at the worker count.

from collections import OrderedDict

_STAGE_CACHE: "OrderedDict" = OrderedDict()
_STAGE_CACHE_MAX = 8


def task_stage(cls, ctor_args: tuple, key: tuple):
    """Wrap callable-class ``cls`` as a plain function for ``map_batches``:
    the instance is constructed once per worker process per ``key`` (must
    uniquely identify ``ctor_args`` — ObjectRefs are hashable and make good
    key components) and cached in a small per-process LRU (a hit refreshes
    recency, so interleaved streaming stages don't evict each other's
    still-active state).

    The cache MUST be resolved through the imported module at call time:
    ``fn`` is a dynamic closure, so cloudpickle ships it by VALUE — a bare
    global reference to ``_STAGE_CACHE`` would be captured as a fresh empty
    dict in every serialized task, silently rebuilding the state once per
    TASK instead of once per worker (measured: 64 index builds for 64 tasks
    across 32 workers — the "warm worker" path wasn't warm at all)."""

    def fn(batch, _cls=cls, _args=ctor_args, _key=key):
        from marc_record_merge_melindautils_ray.functions import util as _util

        cache = _util._STAGE_CACHE
        inst = cache.get(_key)
        if inst is None:
            inst = _cls(*_args)
            if len(cache) >= _util._STAGE_CACHE_MAX:
                cache.popitem(last=False)
            cache[_key] = inst
        else:
            cache.move_to_end(_key)
        return inst(batch)

    fn.__name__ = f"task_{getattr(cls, '__name__', 'stage')}"
    return fn


def sorted_membership(sorted_keys, ids):
    """Vectorized membership of int64 ``ids`` in ascending ``sorted_keys``
    (the broadcast-key-set filter idiom: clip + searchsorted + equality).
    Returns a bool mask; empty key sets match nothing."""
    import numpy as np

    if not len(sorted_keys):
        return np.zeros(len(ids), bool)
    pos = np.clip(np.searchsorted(sorted_keys, ids), 0, len(sorted_keys) - 1)
    return sorted_keys[pos] == ids
