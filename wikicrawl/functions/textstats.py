"""Text-analysis operators over a document table (training-data pipeline ops).

All are stateless vectorized ``map_batches`` transforms over Arrow batches:
token counting (``\\S+`` runs), language-ID (stopword-count heuristic),
quality scoring (length / punctuation / token stats), and document
fingerprinting (md5 content hash + 64-bit rolling hash).

Each has an exact ANSI-SQL twin in :mod:`wikicrawl.queries` so the driver's
DuckDB oracle can value-check it; the formulas are deliberately arithmetic
(substring counts, lengths) so both sides compute identical values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# language-ID heuristic: padded stopword substring counts per language.
# pred = argmax of summed counts, ties broken by language order below.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " y "],
    "de": [" der ", " die ", " und "],
}
LANG_ORDER = ["en", "fr", "es", "de"]

PUNCT = [".", ",", "!", "?", ";"]


def _count_sub(col: pa.ChunkedArray | pa.Array, sub: str) -> pa.Array:
    return pc.count_substring(col, sub)


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum
# non-space — the GPT-2-style split shape, chosen because BOTH Arrow and
# DuckDB compile it with RE2, so the count is bit-identical on both sides
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """tokens = number of ``\\S+`` runs; bpe_tokens = BPE-ish pre-tokenizer
    piece count (both vectorized regex counts)."""
    n_tok = pc.count_substring_regex(batch[text_col], r"\S+")
    n_bpe = pc.count_substring_regex(batch[text_col], BPE_TOKEN_RE)
    n_chars = pc.utf8_length(batch[text_col])
    return (
        batch.append_column("n_tokens", pc.cast(n_tok, pa.int64()))
        .append_column("n_bpe_tokens", pc.cast(n_bpe, pa.int64()))
        .append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))
    )


def lang_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-language marker counts + predicted language (padded text)."""
    padded = pc.binary_join_element_wise(
        pa.array([" "] * batch.num_rows), batch[text_col], " ", ""
    )
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        total = None
        for m in markers:
            c = pc.cast(_count_sub(padded, m), pa.int64())
            total = c if total is None else pc.add(total, c)
        scores[lang] = total
    mat = np.stack([scores[lang].to_numpy() for lang in LANG_ORDER])
    pred_idx = np.argmax(mat, axis=0)  # first max wins (LANG_ORDER tiebreak)
    pred = pa.array([LANG_ORDER[i] for i in pred_idx])
    out = batch
    for lang in LANG_ORDER:
        out = out.append_column(f"score_{lang}", scores[lang])
    return out.append_column("pred_lang", pred)


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_chars / n_tokens / n_punct / mean token length (×1000, int) /
    is_low_quality flag. Integer outputs so oracle hashes match exactly."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_punct = None
    for p in PUNCT:
        c = pc.cast(_count_sub(text, p), pa.int64())
        n_punct = c if n_punct is None else pc.add(n_punct, c)
    # mean token length in milli-chars: non-space chars * 1000 // n_tokens
    denom = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    non_space = pc.subtract(n_chars, pc.cast(_count_sub(text, " "), pa.int64()))
    mean_tok_millis = pc.cast(
        pc.floor(pc.divide(pc.cast(pc.multiply(non_space, 1000), pa.float64()), pc.cast(denom, pa.float64()))),
        pa.int64(),
    )
    low = pc.or_(pc.less(n_chars, 100), pc.less(n_tokens, 20))
    return (
        batch.append_column("n_chars_calc", n_chars)
        .append_column("n_tokens", n_tokens)
        .append_column("n_punct", n_punct)
        .append_column("mean_tok_millis", mean_tok_millis)
        .append_column("is_low_quality", low)
    )


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex fingerprint + 64-bit FNV-1a rolling hash (int64).

    FNV is sequential per byte but vectorized ACROSS documents: texts are
    packed into one (n_docs, max_len) byte matrix and the chain advances one
    byte-position per step for all docs at once — max_len numpy passes
    instead of total_bytes Python iterations."""
    texts = batch[text_col].to_pylist()
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in texts]
    n = len(bufs)
    fnv = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n:
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        max_len = int(lens.max()) if len(lens) else 0
        mat = np.zeros((n, max_len), dtype=np.uint8)
        for i, b in enumerate(bufs):
            mat[i, : len(b)] = b
        prime = np.uint64(0x100000001B3)
        for j in range(max_len):
            advanced = (fnv ^ mat[:, j].astype(np.uint64)) * prime
            fnv = np.where(j < lens, advanced, fnv)
    return batch.append_column("fp_md5", pa.array(md5s)).append_column(
        "fp_fnv", pa.array(fnv.view(np.int64))
    )


# PII patterns: RE2 syntax only, so Arrow (count/replace_substring_regex)
# and DuckDB (regexp_extract_all/regexp_replace 'g') compile the SAME
# automaton and the scrub is bit-identical on both sides of the oracle.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{7}"

# applied in this fixed order (emails first: their domains contain dots
# but no all-digit octets, so the later IP pass cannot double-redact)
PII_RULES = [("n_emails", PII_EMAIL_RE, "<EMAIL>"),
             ("n_ips", PII_IP_RE, "<IP>"),
             ("n_phones", PII_PHONE_RE, "<PHONE>")]


def pii_scrub(batch: pa.Table, text_col: str = "text",
              out_col: str = "redacted") -> pa.Table:
    """Count + redact PII spans (emails, IPv4s, +NN-NNN-NNNNNNN phones).

    Fully vectorized: one RE2 count and one RE2 global replace per rule —
    no Python per row. Redaction order is PII_RULES order on both the
    Arrow and the SQL side."""
    text = batch[text_col]
    for name, pattern, _ in PII_RULES:
        batch = batch.append_column(
            name, pc.cast(pc.count_substring_regex(text, pattern), pa.int64()))
    red = text
    for _, pattern, token in PII_RULES:
        red = pc.replace_substring_regex(red, pattern, token)
    return batch.append_column(out_col, red)


def repetition_signals(batch: pa.Table, id_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """Gopher-style repetition/quality signals per document: token count,
    distinct-token count, most-frequent-token count, most-frequent-bigram
    count, and rep_milli = floor(1000 * (1 - distinct/total)).

    Vectorized ACROSS the batch: all docs' tokens are factorized into one
    flat integer code array; per-(doc, token) and per-(doc, bigram) counts
    come from single np.unique calls over composite int64 keys, and the
    per-doc maxima from one maximum.reduceat each — no per-doc Python
    beyond the (inherently per-string) tokenize."""
    import pandas as pd

    from wikicrawl.functions.dedup import tokenize

    texts = batch[text_col].to_pylist()
    toks_per = [tokenize(t or "") for t in texts]
    lens = np.array([len(ts) for ts in toks_per], dtype=np.int64)
    n_docs = len(texts)
    flat = np.array([tok for ts in toks_per for tok in ts], dtype=object)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    if len(flat):
        codes, uniq = pd.factorize(flat)
        codes = codes.astype(np.int64)
        K = np.int64(len(uniq) + 1)
    else:
        codes = np.zeros(0, dtype=np.int64)
        K = np.int64(1)

    def _per_doc_max_and_count(keys: np.ndarray, divisor: np.int64):
        """keys = doc*divisor + item -> (distinct per doc, max count per doc)."""
        distinct = np.zeros(n_docs, dtype=np.int64)
        top = np.zeros(n_docs, dtype=np.int64)
        if len(keys):
            uk, counts = np.unique(keys, return_counts=True)
            uk_doc = (uk // divisor).astype(np.int64)
            distinct = np.bincount(uk_doc, minlength=n_docs).astype(np.int64)
            starts = np.flatnonzero(np.r_[True, uk_doc[1:] != uk_doc[:-1]])
            top[uk_doc[starts]] = np.maximum.reduceat(counts, starts)
        return distinct, top

    n_distinct, top_tok = _per_doc_max_and_count(doc_idx * K + codes, K)
    if len(codes) > 1:
        adj = doc_idx[1:] == doc_idx[:-1]
        bg_keys = ((doc_idx[1:][adj] * K + codes[:-1][adj]) * K
                   + codes[1:][adj])
    else:
        bg_keys = np.zeros(0, dtype=np.int64)
    _, top_bg = _per_doc_max_and_count(bg_keys, K * K)
    rep_milli = (1000 * (lens - n_distinct)) // np.maximum(lens, 1)
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(lens, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "top_token_cnt": pa.array(top_tok, pa.int64()),
        "top_bigram_cnt": pa.array(top_bg, pa.int64()),
        "rep_milli": pa.array(rep_milli, pa.int64()),
    }).filter(pc.greater(pa.array(lens, pa.int64()), 0))


# ---------------------------------------------------------------- TF-IDF

TFIDF_PB = 64  # coarse partitions for the document-frequency aggregate


def tfidf_topk(ds, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text"):
    """Top-k salient terms per document by an integer-exact TF-IDF:
    ``score_milli = (tf * 1000 * n_docs) // df``. The rational N/df form
    is monotone in the classic ``tf * ln(N/df)`` for fixed tf and keeps
    the entire computation in int64 — bit-identical between numpy and the
    SQL twin, where transcendental ``ln`` would not be (float discipline;
    demo-safe while ``tf * 1000 * n_docs < 2**63`` — a log-domain idf
    replaces it beyond that).

    Scale shape: document frequency is the q29 pattern — per-doc DISTINCT
    token hashes, ONE shuffle into ``TFIDF_PB`` coarse hash partitions,
    vectorized pandas counts per partition (df is complete within its
    owning partition; never Ray's per-key aggregate). The (vocab-sized)
    df table broadcasts once via ``ray.put``; scoring + per-doc top-k
    then run fully inside ``map_batches`` — a document's tf vector never
    leaves its batch, so there is NO doc-keyed shuffle at all. For a
    vocabulary too big to broadcast, the same semantics fall out of a
    token-bucket co-partitioned join (see ``decontaminate_join``).

    Hash caveat (shared with q40): df keys are md5-low-64 of the term;
    the oracle groups by the term STRING — they agree unless md5-low-64
    collides."""
    import pandas as pd
    import ray

    from wikicrawl.functions import dedup as F_dedup
    from wikicrawl.functions._cache import broadcast_cached

    n_docs = ds.count()

    def explode_distinct(t: pa.Table) -> pa.Table:
        hs: list[int] = []
        for txt in t[text_col].to_pylist():
            toks = set(F_dedup.tokenize(txt))
            hs.extend(F_dedup.token_hash_u64(tok) for tok in toks)
        gh = (np.array(hs, dtype=np.uint64).view(np.int64)
              if hs else np.zeros(0, np.int64))
        pb = (gh.view(np.uint64) % np.uint64(TFIDF_PB)).view(np.int64)
        return pa.table({"gh": pa.array(gh), "__pb": pa.array(pb)})

    def bucket_df(g: "pd.DataFrame") -> "pd.DataFrame":
        return (g.groupby("gh", sort=False).size().rename("df")
                .reset_index())

    df_tbl = (ds.map_batches(explode_distinct, batch_format="pyarrow")
              .groupby("__pb").map_groups(bucket_df, batch_format="pandas")
              .to_pandas())
    gh_arr = df_tbl["gh"].to_numpy(np.int64)
    order = np.argsort(gh_arr)
    df_ref = ray.put((gh_arr[order],
                      df_tbl["df"].to_numpy(np.int64)[order]))

    empty = pa.table({
        id_col: pa.array([], pa.int64()), "term": pa.array([], pa.string()),
        "tf": pa.array([], pa.int64()), "df": pa.array([], pa.int64()),
        "score_milli": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
    })

    def topk_per_doc(t: pa.Table) -> pa.Table:
        ghs, dfs = broadcast_cached(df_ref, lambda x: x)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc_idx_l: list[int] = []
        toks_l: list[str] = []
        for i, txt in enumerate(t[text_col].to_pylist()):
            tt = F_dedup.tokenize(txt)
            toks_l.extend(tt)
            doc_idx_l.extend([i] * len(tt))
        if not toks_l:
            return empty
        codes, uniques = pd.factorize(np.array(toks_l, dtype=object))
        doc_idx = np.array(doc_idx_l, dtype=np.int64)
        nu = np.int64(len(uniques))
        comp_u, tf = np.unique(doc_idx * nu + codes, return_counts=True)
        d_pos = (comp_u // nu).astype(np.int64)
        code_u = (comp_u % nu).astype(np.int64)
        uh = np.array([F_dedup.token_hash_u64(x) for x in uniques],
                      dtype=np.uint64).view(np.int64)
        dfv = dfs[np.searchsorted(ghs, uh[code_u])]  # df >= 1 always
        score = (tf.astype(np.int64) * np.int64(1000)
                 * np.int64(n_docs)) // dfv
        terms = np.asarray(uniques, dtype=object)[code_u]
        # (doc ASC, score DESC, term ASC) via composed stable sorts
        idx = np.argsort(terms, kind="stable")
        idx = idx[np.argsort(-score[idx], kind="stable")]
        idx = idx[np.argsort(d_pos[idx], kind="stable")]
        dsorted = d_pos[idx]
        starts = np.r_[0, np.flatnonzero(dsorted[1:] != dsorted[:-1]) + 1]
        grp = np.repeat(starts, np.diff(np.r_[starts, len(dsorted)]))
        rank = np.arange(len(dsorted)) - grp + 1
        keep = idx[rank <= k]
        return pa.table({
            id_col: pa.array(ids[d_pos[keep]]),
            "term": pa.array(terms[keep].tolist(), pa.string()),
            "tf": pa.array(tf[keep].astype(np.int64)),
            "df": pa.array(dfv[keep]),
            "score_milli": pa.array(score[keep]),
            "rank": pa.array(rank[rank <= k], pa.int64()),
        })

    return ds.map_batches(topk_per_doc, batch_format="pyarrow")


# --------------------------------------------------------- bigram LM quality

LM_PB = 64  # coarse partitions for the count-attach shuffles


def bigram_lm_scores(ds, id_col: str = "doc_id", text_col: str = "text",
                     n_parts: int = LM_PB):
    """Corpus-conditional bigram-LM quality score (the CCNet-style
    "perplexity filter" re-expressed integer-exact): for every adjacent
    token pair (w1, w2) in a document, its corpus conditional probability
    in milli units is ``(count(w1 w2) * 1000) // count(w1·)`` where
    ``count(w1·)`` is how often w1 occurs in a non-final position; the
    document score ``lm_milli`` is the integer mean over its bigrams.
    High-probability (repetitive / formulaic) text scores high, rare
    constructions score low — the standard LM-based quality signal with
    ``//`` instead of transcendental log so the SQL twin is bit-exact.

    Scale shape — THREE co-partitioned shuffles of the occurrence table,
    never a vocabulary materialization on the driver (a corpus-wide
    bigram table is NOT broadcastable at scale, unlike q42's unigram df):

    1. explode (doc, w1h, bh) occurrences, shuffle on ``hash(w1h)``:
       every occurrence of a left-word lands in one partition, so
       ``cnt_uni`` is a vectorized in-partition ``transform('size')``;
    2. shuffle on ``hash(bh)``: attach ``cnt_bi`` the same way and emit
       the per-occurrence integer score;
    3. shuffle on ``hash(doc)``: per-doc sum / count → ``lm_milli``.

    Token / bigram keys are md5-low-64 (DuckDB ``md5_number_upper``) of
    the token and of the space-joined pair; tokens contain no whitespace
    so the joiner is injective. Docs with < 2 tokens have no bigrams and
    are absent from the result (same as the SQL GROUP BY)."""
    import pandas as pd

    from wikicrawl.functions import dedup as F_dedup

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        w1: list[str] = []
        bg: list[str] = []
        di: list[int] = []
        for i, txt in enumerate(texts):
            toks = F_dedup.tokenize(txt)
            m = len(toks) - 1
            if m <= 0:
                continue
            w1.extend(toks[:-1])
            bg.extend(toks[j] + " " + toks[j + 1] for j in range(m))
            di.extend([i] * m)
        id_type = t.schema.field(id_col).type
        if not di:
            return pa.table({
                id_col: pa.array([], id_type),
                "w1h": pa.array([], pa.int64()),
                "bh": pa.array([], pa.int64()),
                "__p": pa.array([], pa.int64()),
            })
        # one md5 per UNIQUE token / bigram in the batch (they repeat
        # heavily), scattered back through np.unique's inverse
        uw, iw = np.unique(np.array(w1, dtype=object), return_inverse=True)
        ub, ib = np.unique(np.array(bg, dtype=object), return_inverse=True)
        w1h = np.array([F_dedup.token_hash_u64(x) for x in uw],
                       dtype=np.uint64)[iw]
        bh = np.array([F_dedup.token_hash_u64(x) for x in ub],
                      dtype=np.uint64)[ib]
        return pa.table({
            id_col: pa.array(ids[np.array(di, dtype=np.int64)]),
            "w1h": pa.array(w1h.view(np.int64)),
            "bh": pa.array(bh.view(np.int64)),
            "__p": pa.array((w1h % np.uint64(n_parts)).view(np.int64)),
        })

    def attach_cu(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.drop(columns="__p")
        g["cu"] = g.groupby("w1h", sort=False)["w1h"].transform("size")
        g["__p"] = (g["bh"].to_numpy().view(np.uint64)
                    % np.uint64(n_parts)).view(np.int64)
        return g

    def attach_cb_score(g: "pd.DataFrame") -> "pd.DataFrame":
        cb = g.groupby("bh", sort=False)["bh"].transform("size").to_numpy()
        s = (cb.astype(np.int64) * 1000) // g["cu"].to_numpy(np.int64)
        ids = g[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids, "s": s,
            "__p": (ids.astype(np.uint64) % np.uint64(n_parts))
                   .view(np.int64),
        })

    def reduce_doc(g: "pd.DataFrame") -> "pd.DataFrame":
        grp = g.groupby(id_col, sort=False)["s"]
        n = grp.size()
        return pd.DataFrame({
            id_col: n.index.to_numpy(),
            "n_bigrams": n.to_numpy(np.int64),
            "lm_milli": (grp.sum().to_numpy(np.int64)
                         // n.to_numpy(np.int64)),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("__p").map_groups(attach_cu, batch_format="pandas")
            .groupby("__p").map_groups(attach_cb_score,
                                       batch_format="pandas")
            .groupby("__p").map_groups(reduce_doc, batch_format="pandas"))


# --------------------------------------------------------- quality gate

GATE_MIN_CHARS = 100
GATE_MIN_TOKENS = 20
GATE_MAX_REP_MILLI = 650
GATE_MAX_TOP_TOK_MILLI = 150


def quality_gate(batch: pa.Table, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """First-wins rule-pipeline document filter with reason codes (the
    Gopher/RefinedWeb-style curation gate): each document gets the FIRST
    failing rule as its reason, 'pass' if none fails —

        1. too_short   n_chars < GATE_MIN_CHARS or n_tokens < GATE_MIN_TOKENS
        2. repetitive  rep_milli > GATE_MAX_REP_MILLI
        3. top_heavy   (1000 * top_token_cnt) // max(n_tokens, 1)
                       > GATE_MAX_TOP_TOK_MILLI
        4. pass

    All signals are per-document, so the gate is a single zero-shuffle
    map_batches; the repetition signals reuse the batch-factorized
    :func:`repetition_signals` kernel. Integer/boolean outputs only, so
    the DuckDB twin hashes identically."""
    import pandas as pd

    ids = batch[id_col].to_pandas().to_numpy()
    n_chars = pc.cast(pc.utf8_length(batch[text_col]), pa.int64()).to_numpy()
    rep = repetition_signals(batch, id_col, text_col).to_pandas()
    df = pd.DataFrame({id_col: ids, "n_chars": n_chars.astype(np.int64)})
    df = df.merge(
        rep[[id_col, "n_tokens", "rep_milli", "top_token_cnt"]],
        on=id_col, how="left")
    for c in ("n_tokens", "rep_milli", "top_token_cnt"):
        df[c] = df[c].fillna(0).astype(np.int64)
    top_tok_milli = ((1000 * df["top_token_cnt"].to_numpy())
                     // np.maximum(df["n_tokens"].to_numpy(), 1))
    reason = np.select(
        [
            (df["n_chars"].to_numpy() < GATE_MIN_CHARS)
            | (df["n_tokens"].to_numpy() < GATE_MIN_TOKENS),
            df["rep_milli"].to_numpy() > GATE_MAX_REP_MILLI,
            top_tok_milli > GATE_MAX_TOP_TOK_MILLI,
        ],
        ["too_short", "repetitive", "top_heavy"],
        default="pass",
    )
    return pa.table({
        id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
        "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
        "n_tokens": pa.array(df["n_tokens"].to_numpy(), pa.int64()),
        "rep_milli": pa.array(df["rep_milli"].to_numpy(), pa.int64()),
        "top_tok_milli": pa.array(top_tok_milli.astype(np.int64), pa.int64()),
        "reason": pa.array(reason.astype(object), pa.string()),
    })
