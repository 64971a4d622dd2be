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
