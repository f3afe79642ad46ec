"""End-to-end TRAINING-DATA pipeline: the LLM-corpus operators composed
as ONE streaming Ray Dataset plan (VERDICT r3 item 6) instead of 33
separate queries:

    documents
      -> exact dedup         (md5(text) keep-min-doc_id; the ONE shuffle)
      -> drop benchmark docs (doc_id % BENCH_MOD == 0 is the held-out set)
      -> stratified sample   (md5(doc_id) % 1000 < rate[lang]; per-batch)
      -> decontaminate       (drop docs sharing any word n-gram with the
                              benchmark set; broadcast probe, per-batch)
      -> token chunking      (fixed CHUNK_TOKENS explode; per-batch)

Scale shape: exactly one all-to-all exchange (the dedup hash partition —
inherent: exact dedup must co-locate equal contents once). Everything
after it is an embarrassingly-parallel per-batch transform; the benchmark
gram set is small by construction (it is the benchmark suite) and
broadcasts once via ``ray.put``. The cheap hash-sample filter runs BEFORE
the n-gram probe so most docs never pay for gram explosion. Output is a
streaming Dataset — write it with ``write_parquet`` (partitioned, so a
failed run resumes by skipping finished partitions).

Oracle: q34 in wikicrawl/queries.py runs this pipeline against a single
DuckDB CTE chain (dedup QUALIFY -> filters -> LATERAL chunk explode) and
the driver value-hashes both — the operators compose exactly, not just
individually.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from wikicrawl.functions.dedup import (ngram_explode_batch, token_hash_u64,
                                       tokenize)

DEDUP_PARTS = 64  # coarse hash partitions for the dedup shuffle


def add_fp_md5(t: pa.Table) -> pa.Table:
    """Append the md5-hex content fingerprint (DuckDB ``md5(text)``)."""
    from wikicrawl.functions.textstats import fingerprints

    return fingerprints(t).select(
        [*(c for c in t.column_names), "fp_md5"])


def exact_dedup_keep_min(ds, n_parts: int = DEDUP_PARTS):
    """Keep exactly one doc per distinct text: the min doc_id. The classic
    exact-dedup shuffle — contents are co-partitioned by a coarse bucket of
    the md5 hex (64 vectorized pandas groupbys, never Ray's per-key
    aggregate), each partition keeps its group minima, and the text moves
    across the wire exactly once."""
    from wikicrawl.functions.joins import bucket_of

    def with_bucket(t: pa.Table) -> pa.Table:
        t = add_fp_md5(t)
        return t.append_column(
            "__db", pa.array(bucket_of(t["fp_md5"], n_parts)))

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby("fp_md5", sort=False)["doc_id"].transform("min")
        out = g[keep == g["doc_id"]]
        return out.drop(columns=["fp_md5", "__db"])

    return (ds.map_batches(with_bucket, batch_format="pyarrow")
            .groupby("__db")
            .map_groups(keep_min, batch_format="pandas")
            .map_batches(lambda t: t.replace_schema_metadata(None),
                         batch_format="pyarrow"))


def benchmark_gram_array(ds, ngram_n: int, bench_mod: int) -> np.ndarray:
    """Sorted distinct gram hashes of the held-out benchmark docs
    (doc_id % bench_mod == 0) — computed over the RAW corpus (the
    benchmark is defined before dedup touches anything). Small by
    construction; per-batch distinct + one driver np.unique."""
    import ray

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ex = ngram_explode_batch(
            t.filter(pa.array(ids % bench_mod == 0)), ngram_n,
            "doc_id", "text")
        return ex.select(["gh"])

    return np.unique(pa.concat_tables([
        ray.get(r) for r in
        ds.map_batches(bench_grams, batch_format="pyarrow").to_arrow_refs()
    ])["gh"].to_numpy())


def make_corpus_filter(bench_ref, ngram_n: int, bench_mod: int,
                       sample_mod: int, sample_rates: dict[str, int]):
    """Per-batch keep filter: not-benchmark AND stratified-sample-kept AND
    uncontaminated. The cheap hash filters run first so only surviving
    docs pay for the gram explode + broadcast probe."""
    from wikicrawl.functions._cache import broadcast_cached

    def corpus_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        langs = t["lang"].to_pylist()
        h = np.array([token_hash_u64(str(i)) for i in ids],
                     dtype=np.uint64) % np.uint64(sample_mod)
        rates = np.array([sample_rates.get(l, 0) for l in langs],
                         dtype=np.uint64)
        t = t.filter(pa.array((ids % bench_mod != 0) & (h < rates)))
        if t.num_rows == 0:
            return t
        b = broadcast_cached(bench_ref, lambda a: a)  # sorted int64 hashes
        ex = ngram_explode_batch(t, ngram_n, "doc_id", "text")
        gh = ex["gh"].to_numpy()
        ids2 = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(b) == 0 or len(gh) == 0:
            return t
        idx = np.searchsorted(b, gh)
        idx[idx == len(b)] = 0
        hit_ids = np.unique(
            ex["doc_id"].to_numpy(zero_copy_only=False)[b[idx] == gh])
        return t.filter(pa.array(~np.isin(ids2, hit_ids)))

    return corpus_filter


def make_chunk_explode(chunk_tokens: int, carry_cols: tuple[str, ...]):
    """Per-batch fixed-size token chunk explode (q31 semantics: a doc with
    no tokens still emits one empty chunk, matching the oracle's
    greatest(len, 1))."""

    def explode_chunks(t: pa.Table) -> pa.Table:
        carried = {c: t[c].to_pylist() for c in carry_cols}
        out: dict[str, list] = {c: [] for c in carry_cols}
        out_ci: list[int] = []
        out_txt: list[str] = []
        out_n: list[int] = []
        for i, text in enumerate(t["text"].to_pylist()):
            toks = tokenize(text)
            n_chunks = max(1, -(-len(toks) // chunk_tokens))
            for ci in range(n_chunks):
                w = toks[ci * chunk_tokens:(ci + 1) * chunk_tokens]
                for c in carry_cols:
                    out[c].append(carried[c][i])
                out_ci.append(ci)
                out_txt.append(" ".join(w))
                out_n.append(len(w))
        cols = {c: pa.array(out[c], t.schema.field(c).type)
                for c in carry_cols}
        cols["chunk_id"] = pa.array(out_ci, pa.int64())
        cols["chunk_text"] = pa.array(out_txt, pa.string())
        cols["n_tokens"] = pa.array(out_n, pa.int64())
        return pa.table(cols)

    return explode_chunks


def training_corpus(ds, *, ngram_n: int = 3, bench_mod: int = 20,
                    sample_mod: int = 1000,
                    sample_rates: dict[str, int] | None = None,
                    chunk_tokens: int = 32, n_parts: int = DEDUP_PARTS):
    """documents Dataset (doc_id, lang, text) -> streaming chunk Dataset
    (doc_id, lang, chunk_id, chunk_text, n_tokens). See module docstring
    for the stage chain and scale shape."""
    import ray

    if sample_rates is None:
        from wikicrawl.queries import SAMPLE_RATES as sample_rates  # noqa

    bench_ref = ray.put(benchmark_gram_array(ds, ngram_n, bench_mod))
    deduped = exact_dedup_keep_min(ds, n_parts)
    clean = deduped.map_batches(
        make_corpus_filter(bench_ref, ngram_n, bench_mod, sample_mod,
                           dict(sample_rates)),
        batch_format="pyarrow")
    return clean.map_batches(
        make_chunk_explode(chunk_tokens, ("doc_id", "lang")),
        batch_format="pyarrow")


def run(sf_dir: str, out_dir: str) -> str:
    """CLI entry: stream the training corpus to partitioned parquet with
    the q34 pipeline constants (so CLI output == the oracled result)."""
    import ray.data as rd

    from wikicrawl.queries import (BENCH_DOC_MOD, CHUNK_TOKENS,
                                   PIPE_NGRAM_N, SAMPLE_MOD, SAMPLE_RATES)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])
    # strip pandas schema metadata (unhashable dicts break Ray's schema
    # dedup in the shuffle reduce — see project perf notes)
    ds = ds.map_batches(lambda t: t.replace_schema_metadata(None),
                        batch_format="pyarrow")
    training_corpus(
        ds, ngram_n=PIPE_NGRAM_N, bench_mod=BENCH_DOC_MOD,
        sample_mod=SAMPLE_MOD, sample_rates=SAMPLE_RATES,
        chunk_tokens=CHUNK_TOKENS,
    ).write_parquet(out_dir)
    return out_dir
