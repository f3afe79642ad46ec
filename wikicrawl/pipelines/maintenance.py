"""Maintenance jobs: the reference's cleanup migrations as Ray Data pipelines.

- :func:`shared_main_images` — the ``clear_shared_main_images`` scan
  (migrations/clear_shared_main_images.py:78-93): group pages by
  main_image_url, count DISTINCT entities, HAVING >= N, ORDER BY count DESC
  — frequency as a decoration detector (filename filters can't catch a
  genuine photo like Apollo_11_Crew.jpg used as a portal banner). With
  ``apply=True`` the offending main-image values are CLEARED from the pages
  table (dry-run by default, like every reference migration).
- :func:`chrome_image_breakdown` — the ``clear_ui_chrome_images`` report
  (migrations/clear_ui_chrome_images.py:97-115): per-filename frequency of
  chrome rows still present in the gallery, top-N. With ``apply=True`` the
  rows are hard-deleted (soft-delete impossible in the reference because
  DELETED is insert-only; here a real delete keeps parity).
- :func:`phash_dup_images` — exact image dedup by perceptual hash over the
  images input table (the ``phash:int64`` hook from input_hint): groupby
  phash, report groups with > 1 distinct image_id.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.compute as pc

from wikicrawl.chrome import is_ui_chrome_url
from wikicrawl.state.table import KeyedTable


def shared_main_images(pages: KeyedTable, min_entities: int = 3, top: int = 50,
                       apply: bool = False) -> pd.DataFrame:
    """Entities sharing one main image; optionally clear those main images.

    Count-distinct via ONE coarse-partition shuffle (hash(url) buckets;
    whole url groups per partition, vectorized drop_duplicates +
    groupby-size — the q05 shape: one shuffle instead of two chained
    aggregates, no per-group pandas lambdas). The apply path pushes the
    clear down into per-partition merge tasks
    (``KeyedTable.transform_partitions``): the driver only ships the
    offending-url set, never reads the table."""
    from wikicrawl.functions.joins import bucket_of

    ds = pages.read_dataset()
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["main_image_url"])),
        batch_format="pyarrow",
    )
    n_parts = 64

    def add_bucket(t):
        import pyarrow as pa

        return t.append_column(
            "__b", pa.array(bucket_of(t["main_image_url"], n_parts))
        )

    def count_distinct_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["main_image_url", "wikidata_id"]].drop_duplicates()
        return (d.groupby("main_image_url", sort=False).size()
                .rename("n_entities").reset_index())

    counts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(count_distinct_part, batch_format="pandas")
        .to_pandas()
    )
    out = counts[counts.n_entities >= min_entities].sort_values(
        ["n_entities", "main_image_url"], ascending=[False, True]
    ).head(top).reset_index(drop=True)

    if apply and len(out):
        bad = set(out.main_image_url)

        def clear(df: pd.DataFrame) -> pd.DataFrame:
            mask = df.main_image_url.isin(bad)
            if mask.any():
                df = df.copy()
                df.loc[mask, "main_image_url"] = None
            return df

        pages.transform_partitions(clear)
    return out


def chrome_image_breakdown(images_out: KeyedTable, top: int = 20,
                           apply: bool = False) -> pd.DataFrame:
    """Frequency report of UI-chrome rows still present in the gallery."""
    ds = images_out.read_dataset()

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["wikidata_id", "lang", "display_order", "image_url", "file_name"]].copy()
        df["is_chrome"] = df.image_url.map(is_ui_chrome_url)
        return df[df.is_chrome]

    rows = ds.map_batches(flag, batch_format="pandas").to_pandas()
    report = (
        rows.groupby("file_name").size().rename("n_rows").reset_index()
        .sort_values(["n_rows", "file_name"], ascending=[False, True])
        .head(top).reset_index(drop=True)
    )
    if apply and len(rows):
        # hard delete by exact key (no soft-delete — parity with the
        # migration), pushed down to per-partition tasks: each partition
        # anti-joins its rows against the broadcast key index (vectorized)
        keys = pd.MultiIndex.from_frame(
            rows[["wikidata_id", "lang", "display_order"]].drop_duplicates()
        )

        def drop_chrome(df: pd.DataFrame) -> pd.DataFrame:
            idx = pd.MultiIndex.from_frame(
                df[["wikidata_id", "lang", "display_order"]]
            )
            keep = ~idx.isin(keys)
            return df.loc[keep] if not keep.all() else df

        images_out.transform_partitions(drop_chrome)
    return report


def phash_dup_images(images_ds, n_parts: int = 64) -> pd.DataFrame:
    """Groups of distinct images sharing a perceptual hash (exact phash dedup).

    Coarse-partition reduce (the q03/q07/q16 pattern): ONE shuffle on
    hash(phash) % n_parts, then each partition — holding many whole phash
    groups — builds its multi-member groups with a single vectorized
    sort + groupby-agg. No per-phash Python lambdas (VERDICT r2 item 7)."""
    import pyarrow as pa

    from wikicrawl.functions.joins import bucket_of

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", pa.array(bucket_of(t["phash"], n_parts)))

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["phash", "image_id"]].drop_duplicates().sort_values(
            ["phash", "image_id"]
        )
        agg = d.groupby("phash", sort=False)["image_id"].agg(
            n_images="size", image_ids=",".join
        ).reset_index()
        return agg[agg.n_images > 1]

    return (
        images_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(reduce_part, batch_format="pandas")
        .to_pandas()
        .sort_values(["n_images", "phash"], ascending=[False, True])
        .reset_index(drop=True)
    )


def recrawl_stale(corpus_dir: str, out_dir: str, older_than_us: int,
                  **crawl_kwargs) -> dict:
    """Staleness-driven incremental recrawl (the reference's quick-mode
    freshness semantics at ROW granularity: quick mode re-runs whole
    families ordered by MAX(TIM_UPDATED) — README.md:417-424 — while this
    refreshes exactly the entities whose pages went stale).

    Seed-owned pages with ``last_crawled_at`` older than the cutoff are
    re-fetched through the normal crawl path scoped by
    ``CrawlConfig.only_qids``; every write is a keyed upsert, so fresh rows
    are untouched and the refreshed rows keep their row identity
    (``_row_id``) and creation stamps. Link-discovered pages ("LNK" ids)
    refresh when a recrawled page still links to them (enable
    ``discover_links``); orphaned discovered pages age out by design.
    Returns {"stale": n_selected, "metrics": crawl metrics}.
    """
    from wikicrawl.pipelines.crawl import CrawlConfig, crawl, open_tables

    tables = open_tables(out_dir, crawl_kwargs.get("n_table_partitions", 8))
    pages = tables["pages"].read_dataset()

    def stale_qids(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        cutoff = pa.scalar(older_than_us, type=pa.timestamp("us"))
        mask = pc.less(t["last_crawled_at"], cutoff)
        keep = t.filter(mask)
        return keep.select(["wikidata_id"])

    stale_df = pages.map_batches(stale_qids, batch_format="pyarrow").to_pandas()
    if "wikidata_id" not in stale_df.columns:  # nothing stale: empty frame
        return {"stale": 0, "metrics": {}}
    qids = {q for q in stale_df["wikidata_id"] if not q.startswith("LNK")}
    if not qids:
        return {"stale": 0, "metrics": {}}
    cfg = CrawlConfig(corpus_dir=corpus_dir, out_dir=out_dir,
                      only_qids=frozenset(qids), **crawl_kwargs)
    res = crawl(cfg)
    return {"stale": len(qids), "metrics": res.metrics}


def phash_near_dup_images(images_ds, max_hamming: int = 3,
                          **dedup_kwargs) -> pd.DataFrame:
    """Perceptual-hash NEAR-duplicate image pairs (hamming <= k over the
    ``phash:int64`` column from input_hint) — catches re-encoded / slightly
    altered copies that :func:`phash_dup_images`' exact grouping misses.
    Band-probe exact for k < 4 (functions/dedup.hamming_dup_pairs); extra
    kwargs (e.g. ``broadcast_threshold_bytes``) pass through to the
    size-switched verify planner."""
    from wikicrawl.functions.dedup import hamming_dup_pairs

    return hamming_dup_pairs(
        images_ds, max_hamming=max_hamming,
        id_col="image_id", hash_col="phash", **dedup_kwargs,
    ).to_pandas()
