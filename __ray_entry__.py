"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(nor in the wikicrawl library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``   — flagship pipeline on /root/testdata/sf0.001: the document
  enrichment pass a training-data pipeline runs (token counts + language ID +
  quality features + content fingerprints) as chained vectorized
  ``map_batches`` stages over Arrow batches.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY §2 + the training-data operator suite (dedup, similarity search,
  text analysis); see wikicrawl/queries.py.
- ``oracle_sql()`` — a DuckDB twin for EVERY query (all 33), with
  identical column names. Sketch and iterative operators included: q17
  exact pairwise shingle Jaccard (the shingle hash is injective over
  5-byte windows), q18/q22 SimHash via DuckDB's ``md5_number_upper`` +
  ``bit_count(xor(...))``, q21 LSH-ANN recall@k whose oracle recomputes
  the sign buckets from the same literal integer projection planes, and
  q23 IVF-ANN recall@k whose oracle recomputes the ENTIRE deterministic
  k-means training (hash-seeded init, micro-quantized cosine argmax,
  grid-quantized means) as unrolled SQL CTEs — recall derived vs the
  exact top-k entirely in SQL, no frozen artifacts anywhere.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: document enrichment over sf0.001 (returns a Dataset)."""
    import ray.data as rd

    from wikicrawl.functions import textstats as F

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ds = ds.map_batches(F.quality_features, batch_format="pyarrow")
    ds = ds.map_batches(F.lang_scores, batch_format="pyarrow")
    ds = ds.map_batches(F.fingerprints, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "lang", "pred_lang", "n_tokens", "n_chars_calc", "n_punct",
         "mean_tok_millis", "is_low_quality", "fp_md5", "fp_fnv"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from wikicrawl.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from wikicrawl.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
