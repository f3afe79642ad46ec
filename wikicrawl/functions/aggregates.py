"""Custom Ray Data aggregations: vectorized per-block argmin/argmax.

``ArgExtreme`` is the hash-aggregate replacement for the
``groupby(...).map_groups(keep first/last row)`` pattern: instead of
materializing one pandas frame per group (a Python loop over millions of
groups at scale), each BLOCK contributes one candidate row per key via a
vectorized Arrow sort, and candidates merge pairwise as plain tuple
comparisons inside Ray's hash aggregate. The payload column of the winning
row comes out as a normal aggregate output column — combine several
``ArgExtreme`` fns (plus Min/Max/Count) in one ``.aggregate(...)`` call to
reconstruct the full winning row with zero joins and zero per-group lambdas.

Reference semantics covered: first-wins precedence dedup and
dedupe-keep-freshest (/root/reference/migrations/add_unique_section_image_keys.py:89-160):
"keep the row with max ID_ROW per key" becomes
``aggregate(ArgExtreme(["id_row"], payload=c, descending=True) for c in cols)``.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import AggregateFn


def _block_candidates(block, sort_cols: list[str], descending: bool):
    """One winning row per block, chosen by lexicographic (sort_cols) order.
    Vectorized: a single Arrow sort_indices + take of one row."""
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if block.num_rows == 0:
        return None
    order = "descending" if descending else "ascending"
    idx = pc.sort_indices(block, sort_keys=[(c, order) for c in sort_cols])
    row = block.take(idx[:1]).to_pylist()[0]
    key = tuple(row[c] for c in sort_cols)
    return (key, row)


class ArgExtreme(AggregateFn):
    """Payload of the row with the lexicographic min/max of ``sort_cols``.

    ``descending=False`` -> the FIRST row in ascending (sort_cols) order
    (argmin); ``descending=True`` -> the last (argmax). Ties beyond
    ``sort_cols`` must be broken by including a unique column in
    ``sort_cols`` (the callers here always do)."""

    def __init__(self, sort_cols: list[str], payload: str,
                 descending: bool = False, alias_name: str | None = None):
        name = alias_name or f"arg{'max' if descending else 'min'}({payload})"
        # accumulators are pickled to bytes so partial-aggregate blocks stay
        # Arrow-native (binary column) instead of falling back to object dtype
        import pickle

        def accumulate_block(acc: Any, block) -> Any:
            cand = _block_candidates(block, sort_cols, descending)
            return merge(acc, None if cand is None else pickle.dumps(cand))

        def merge(a: Any, b: Any) -> Any:
            if a is None:
                return b
            if b is None:
                return a
            ka, kb = pickle.loads(a)[0], pickle.loads(b)[0]
            if descending:
                return a if ka >= kb else b
            return a if ka <= kb else b

        super().__init__(
            init=lambda k: None,
            merge=merge,
            accumulate_block=accumulate_block,
            finalize=lambda a: None if a is None else pickle.loads(a)[1][payload],
            name=name,
        )
