"""Deterministic synthetic virtual wiki (no external data; seeded).

Generates the four input tables of FIXTURES.md §1-4 as parquet under a target
directory:

- ``seeds``       — entity seed list across the 20 families, with precedence
                    overlaps and a sprinkle of invalid Qids (validity-filter path)
- ``sitelinks``   — virtual Wikidata: en/fr titles with gaps, transient-maxlag
                    flags, robots-blocked titles
- ``pages_html``  — rendered page HTML covering every extraction shape the
                    reference handles (h2/h3/h4 nesting, composite titles,
                    no-subsplit end matter, bullets, all five caption markers,
                    chrome files, Fiche technique + Format line, error pages)
- ``images``      — the authoritative input table from BASELINE.json
                    ``input_hint``: (image_id, bytes, w, h, fmt, caption, phash)

Everything derives from blake2-based per-key seeds, so any tier regenerates
bit-identically; the straight-line oracle (:mod:`wikicrawl.oracle`) and the
Ray Data engine crawl the same virtual wiki.
"""

from __future__ import annotations

import hashlib
import json
import os
import urllib.parse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from wikicrawl import codec, schema
from wikicrawl.families import FAMILIES

# Bump when generated content changes shape (cached corpora regenerate).
# v3: pages/images written with bounded row groups so the crawl's broadcast
# loader can fan the read out over Ray tasks (row content is UNCHANGED —
# only the parquet row-group layout differs).
SYNTH_VERSION = 3

# Row-group ceiling for the two big corpus files: small enough that a
# 120k-entity pages table splits into ~14 parallel read units, large
# enough that per-group metadata stays negligible at any tested scale.
CORPUS_ROW_GROUP = 16384

# Hosts of the virtual wiki. upload.wikimedia.org is the hot host (every image).
PAGE_HOSTS = {"en": "en.wikipedia.org", "fr": "fr.wikipedia.org"}
UPLOAD_HOST = "upload.wikimedia.org"

# robots.txt of the virtual wiki: one disallowed path prefix per page host.
ROBOTS_DISALLOW = {
    "en.wikipedia.org": ["/wiki/Special_blocked"],
    "fr.wikipedia.org": ["/wiki/Special_blocked"],
}

_WORDS = (
    "Amber Basalt Cedar Delta Ember Fjord Grove Harbor Iris Jasper Krill "
    "Lumen Maple Nectar Opal Prism Quartz Ridge Slate Tundra Umber Vertex "
    "Willow Xenon Yarrow Zephyr"
).split()

_CHROME_POOL = [
    "OOjs_UI_icon_edit-ltr-progressive.svg",
    "Commons-logo.svg",
    "Blue_pencil.svg",
    "Logo_disambig.svg",
    "Ambox_important.svg",
    "langfr-960px-Blue_pencil.svg.png",
]
_LEGIT_TRICKY_POOL = [
    "Crystal_Pite.jpg",
    "Emblem_of_New_Caledonia.svg",
    "X_Marks_the_Spot_poster.jpg",
    "Portal_2_Official_Logo.png",
]
HOT_SHARED_IMAGE = "Crew_photo_shared.jpg"

# Family mix (weights roughly echo the reference's family sizes).
_FAMILY_WEIGHTS = np.array(
    [18, 22, 14, 6, 4, 1, 3, 2, 3, 3, 2, 3, 2, 3, 2, 4, 2, 2, 2, 2], dtype=float
)


def _h(*parts) -> int:
    """Stable 64-bit hash of the key parts (process-independent)."""
    s = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def _rng(*parts) -> np.random.Generator:
    return np.random.default_rng(_h(*parts))


# ---------------------------------------------------------------- URL helpers


def image_url_for(file_name: str) -> str:
    """Commons-style upload URL for a (underscored) filename."""
    d = hashlib.md5(file_name.encode("utf-8")).hexdigest()
    return (
        f"https://{UPLOAD_HOST}/wikipedia/commons/{d[0]}/{d[0:2]}/"
        f"{urllib.parse.quote(file_name)}"
    )


def thumb_url_for(file_name: str, width: int = 320) -> str:
    d = hashlib.md5(file_name.encode("utf-8")).hexdigest()
    q = urllib.parse.quote(file_name)
    return (
        f"https://{UPLOAD_HOST}/wikipedia/commons/thumb/{d[0]}/{d[0:2]}/"
        f"{q}/{width}px-{q}"
    )


def mime_for(file_name: str) -> str:
    ext = file_name.rsplit(".", 1)[-1].lower()
    return {
        "svg": "image/svg+xml",
        "png": "image/png",
        "jpg": "image/jpeg",
        "jpeg": "image/jpeg",
        "ogv": "video/ogg",
    }.get(ext, "image/png")


def file_prefix(lang: str) -> str:
    return "Fichier:" if lang == "fr" else "File:"


def commons_title_for(file_name: str, lang: str) -> str:
    return file_prefix(lang) + file_name.replace("_", " ")


# ---------------------------------------------------------------- seeds


def _make_seeds(n_entities: int, seed: int):
    rng = _rng("families", seed)
    fam_of = rng.choice(len(FAMILIES), size=n_entities, p=_FAMILY_WEIGHTS / _FAMILY_WEIGHTS.sum())
    rows = []  # (family, rank, qid, local_int_id)
    next_int_id = {f.content: 1000 + 97 * f.rank for f in FAMILIES}
    for i in range(n_entities):
        qid = f"Q{i + 1}"
        fams = [FAMILIES[fam_of[i]]]
        if i % 10 == 7:  # precedence overlap: appears in a second, later family
            other = FAMILIES[(FAMILIES[fam_of[i]].rank + 3) % len(FAMILIES)]
            if other.rank != fams[0].rank:
                fams.append(other)
        for f in fams:
            if f.id_kind == "int":
                local = str(next_int_id[f.content])
                next_int_id[f.content] += rng.integers(1, 4)
            else:
                local = qid
            rows.append((f.content, f.rank, qid, local))
    # a few invalid wikidata ids exercising the ^Q[0-9]+$ filter
    bad = ["", "Q12X3", "P55", "QQ1", "q77"]
    for j, b in enumerate(bad):
        f = FAMILIES[j % len(FAMILIES)]
        rows.append((f.content, f.rank, b, f"9{j}9"))

    # seed_order: position within family by local id ascending (numeric for
    # int-kind, lexicographic for qid-kind — varchar ORDER BY semantics).
    by_family: dict[str, list] = {}
    for r in rows:
        by_family.setdefault(r[0], []).append(r)
    out = {k: [] for k in ("entity_id", "wikidata_id", "family", "family_rank", "seed_order")}
    for fam, rs in by_family.items():
        kind = next(f.id_kind for f in FAMILIES if f.content == fam)
        key = (lambda r: int(r[3])) if kind == "int" else (lambda r: r[3])
        rs.sort(key=key)
        for order, r in enumerate(rs):
            out["family"].append(r[0])
            out["family_rank"].append(r[1])
            out["wikidata_id"].append(r[2])
            out["entity_id"].append(r[3])
            out["seed_order"].append(order)
    return pa.table(out, schema=schema.SEEDS)


# ---------------------------------------------------------------- sitelinks


def _title_for(qid_num: int, lang: str) -> str:
    rng = _rng("title", qid_num, lang)
    w1, w2 = rng.choice(_WORDS), rng.choice(_WORDS)
    shape = qid_num % 8
    if qid_num % 41 == 0:
        return f"Special blocked {w1} {qid_num}"  # robots-disallowed path
    if shape == 0:
        return f"{w1}{qid_num}"
    if shape == 1:
        return f"{w1} {w2} {qid_num}"
    if shape == 2:
        return f"L'{w1} {qid_num}" if lang == "fr" else f"{w1}'s {w2} {qid_num}"
    if shape == 3:
        return f"{w1} é{w2.lower()} {qid_num}"
    if shape == 4:
        return f"{w1} - {w2} {qid_num}"  # intra-title spaced hyphen (escaping case)
    if shape == 5:
        return f"{w1} ({w2} {qid_num})"
    if shape == 6:
        return f"{w1}–{w2} {qid_num}"
    return f"{w1} {qid_num}"


def _make_sitelinks(n_entities: int, seed: int):
    out = {k: [] for k in ("wikidata_id", "lang", "page_title", "maxlag_fails")}
    for i in range(n_entities):
        qnum = i + 1
        qid = f"Q{qnum}"
        r = _rng("sitelink", seed, qnum)
        has_en = r.random() < 0.88
        has_fr = r.random() < 0.72
        if qnum % 113 == 0:
            fails = 6  # exhausts the 5-attempt budget -> transient, retry later
        elif qnum % 37 == 0:
            fails = 2  # succeeds on 3rd attempt
        else:
            fails = 0
        for lang, has in (("en", has_en), ("fr", has_fr)):
            if has:
                out["wikidata_id"].append(qid)
                out["lang"].append(lang)
                out["page_title"].append(_title_for(qnum, lang))
                out["maxlag_fails"].append(fails)
    return pa.table(out, schema=schema.SITELINKS)


# ---------------------------------------------------------------- page HTML

_SECTION_POOL_EN = ["History", "Career", "Plot", "Production", "Reception", "Legacy"]
_SECTION_POOL_FR = ["Histoire", "Carrière", "Synopsis", "Production", "Accueil"]
_END_MATTER = {"en": ["References", "See also", "Notes"], "fr": ["Références", "Voir aussi"]}


def _para(rng, n=14) -> str:
    return " ".join(str(rng.choice(_WORDS)).lower() for _ in range(n)) + "."


def _img_block(marker: int, file_name: str, caption: str, lang: str) -> str:
    """One image placement using one of the five caption-marker shapes
    (or a captionless decorative shape when caption == "")."""
    href = f"/wiki/{file_prefix(lang)}{urllib.parse.quote(file_name)}"
    a = f'<a class="mw-file-description" href="{href}"><img src="{image_url_for(file_name)}"></a>'
    if marker == 0:
        cap = f"<figcaption>{caption}</figcaption>" if caption else ""
        return f"<figure>{a}{cap}</figure>"
    if marker == 1:
        cap = f'<div class="gallerytext">{caption}</div>' if caption else ""
        return f'<li class="gallerybox"><div>{a}</div>{cap}</li>'
    if marker == 2:
        cap = f'<div class="thumbcaption">{caption}</div>' if caption else ""
        return f'<div class="thumb tright"><div>{a}{cap}</div></div>'
    if marker == 3:
        cap = f'<div class="infobox-caption">{caption}</div>' if caption else ""
        return f'<table class="infobox"><tr><td class="infobox-image">{a}{cap}</td></tr></table>'
    if marker == 4 and lang == "fr":
        cap = f'<div class="legend">{caption}</div>' if caption else ""
        return f'<div class="images">{a}</div>{cap}'
    # captionless thumb nested in gallerybox (the keep-walking case)
    cap = f'<div class="gallerytext">{caption}</div>' if caption else ""
    return f'<li class="gallerybox"><div class="thumb">{a}</div>{cap}</li>'


def _caption_text(file_name: str) -> str:
    rng = _rng("caption", file_name)
    return f"{rng.choice(_WORDS)} {rng.choice(_WORDS)} — {file_name.rsplit('.', 1)[0].replace('_', ' ')}"


def _link_anchor(title: str) -> str:
    href = "/wiki/" + urllib.parse.quote(title.replace(" ", "_"))
    return f'<a href="{href}">{title}</a>'


def _page_html(qnum: int, lang: str, family: str, image_pool: list[str],
               page_scale: int = 1, link_candidates: list[str] | None = None):
    """Build one page's HTML; returns (html, file_names, main_image_url).

    ``page_scale`` multiplies body text volume (real Wikipedia pages run
    50-200 KB of rendered HTML; the bench corpus uses a higher scale so the
    parse stage carries realistic weight). ``link_candidates``: same-lang
    page titles this page may link to with in-body ``/wiki/`` anchors (the
    dynamic-frontier feed)."""
    rng = _rng("page", qnum, lang)
    parts = ["<body>"]
    placed: list[str] = []
    links: list[str] = []
    if link_candidates:
        n_links = int(rng.integers(0, 4))
        for _ in range(n_links):
            links.append(link_candidates[int(rng.integers(0, len(link_candidates)))])
        if qnum % 17 == 0:  # occasional red link (no such page)
            links.append(f"Missing topic {qnum % 500} {lang}")
        if qnum % 31 == 0:  # robots-disallowed discovery target
            links.append(f"Special blocked discovery {lang}")

    def place(file_name: str, marker: int, captioned: bool = True):
        caption = _caption_text(file_name) if captioned else ""
        parts.append(_img_block(marker, file_name, caption, lang))
        placed.append(file_name)

    # Lead/infobox image (sometimes chrome, sometimes absent).
    lead_roll = rng.random()
    main_image_url = ""
    if lead_roll < 0.70:
        lead = image_pool[int(rng.integers(0, len(image_pool)))]
        place(lead, 3)
        main_image_url = image_url_for(lead)
    elif lead_roll < 0.80:
        chrome = _CHROME_POOL[int(rng.integers(0, len(_CHROME_POOL)))]
        place(chrome, 3, captioned=False)
        main_image_url = image_url_for(chrome)  # must be REJECTED by the filter
    # else: no lead image at all (column left untouched — honest emptiness)

    # decorative icon inside the infobox area, never captioned
    if rng.random() < 0.5:
        place("OOjs_UI_icon_edit-ltr-progressive.svg", 3, captioned=False)

    parts.append(f"<p>{_para(rng)}</p>")
    if rng.random() < 0.5:
        parts.append(f"<div><p>{_para(rng, 8)}</p></div>")

    pool = _SECTION_POOL_FR if lang == "fr" else _SECTION_POOL_EN
    n_sections = int(rng.integers(2, 5))
    titles = list(rng.choice(pool, size=n_sections, replace=False))
    for ti, t in enumerate(titles):
        if qnum % 23 == 0 and ti == 0:
            t = f"{t} - era"  # intra-title spaced hyphen in an H2
        parts.append(f"<h2>{t}</h2>")
        parts.append(f"<p>{_para(rng)}[edit]</p>")
        if links and ti < len(links):
            parts.append(f"<p>See {_link_anchor(links[ti])} {_para(rng, 4)}</p>")
        for _ in range(page_scale - 1):
            parts.append(f"<p>{_para(rng, 40)}</p>")
        # an image inside the section body
        if rng.random() < 0.65:
            fn = image_pool[int(rng.integers(0, len(image_pool)))]
            marker = int(rng.integers(0, 6))
            place(fn, marker, captioned=rng.random() < 0.8)
        if qnum % 7 == 0 and ti == 0:
            place(HOT_SHARED_IMAGE, 1)  # hot shared image (frequency-job analog)
        n_h3 = int(rng.integers(0, 3))
        for h3i in range(n_h3):
            h3t = f"{rng.choice(_WORDS)} phase {h3i + 1}"
            if qnum % 29 == 0 and h3i == 0:
                h3t = f"{2015 - h3i} - present"  # spaced hyphen in H3 (escape case)
            parts.append(f"<h3>{h3t}</h3><p>{_para(rng, 10)}</p>")
            if rng.random() < 0.3:
                parts.append(f"<h4>Detail</h4><p>{_para(rng, 6)}</p>")
        if rng.random() < 0.4:
            items = "".join(f"<li>{_para(rng, 4)}</li>" for _ in range(3))
            parts.append(f"<ul>{items}</ul>")

    # French movie page: Fiche technique with a Format line.
    if family == "movie" and lang == "fr":
        parts.append("<h2>Fiche technique</h2>")
        fmt_variant = qnum % 3
        items = [f"<li>Titre : {_para(rng, 3)}</li>"]
        if fmt_variant != 2:
            items.append(f"<li>Format : 35 mm – couleur – {qnum % 4 + 1},85:1</li>")
        items.append(f"<li>Pays : France</li>")
        parts.append(f"<ul>{''.join(items)}</ul>")

    # any links that didn't fit a section go in one tail paragraph
    if links and len(links) > n_sections:
        rest = " · ".join(_link_anchor(t) for t in links[n_sections:])
        parts.append(f"<p>Related: {rest}</p>")

    # End matter (never sub-split), with an h3 that must stay inline.
    em = _END_MATTER[lang][qnum % len(_END_MATTER[lang])]
    parts.append(f"<h2>{em}</h2><p>{_para(rng, 6)}</p>")
    parts.append(f"<h3>Sub part</h3><p>{_para(rng, 5)}</p>")

    parts.append("</body>")

    # Action-API file list: document-order placements, plus occasionally a
    # file that is not visible in the HTML (caption comes back empty) and a
    # non-image mime that must be dropped by the mime filter.
    file_names = list(dict.fromkeys(placed))
    if qnum % 11 == 0:
        file_names.append(f"Data_plot_{qnum}.png")
    if qnum % 13 == 0:
        file_names.append(f"Clip_{qnum}.ogv")
    return "".join(parts), file_names, main_image_url


def _make_pages_and_images(seeds: pa.Table, sitelinks: pa.Table, seed: int,
                           page_scale: int = 1):
    # first-wins family per qid (for page-shape decisions like Fiche technique)
    fam_min: dict[str, tuple[int, str]] = {}
    for qid, fam, rank in zip(
        seeds["wikidata_id"].to_pylist(),
        seeds["family"].to_pylist(),
        seeds["family_rank"].to_pylist(),
    ):
        cur = fam_min.get(qid)
        if cur is None or rank < cur[0]:
            fam_min[qid] = (rank, fam)

    # base image pool: legit images + tricky legit names
    n_pool = max(24, len(fam_min) // 3)
    image_pool = [f"{_WORDS[i % len(_WORDS)]}_subject_{i}.jpg" for i in range(n_pool)]
    image_pool += _LEGIT_TRICKY_POOL

    # link-only pages: exist only as /wiki/ targets (never in any seed
    # table) — the dynamic frontier has to DISCOVER them (north_star);
    # they chain to each other so BFS depth exceeds one level
    n_extra = max(4, len(fam_min) // 10)
    link_only: dict[str, list[str]] = {
        lang: [
            f"Dossier {_WORDS[k % len(_WORDS)]} {k} {lang}" for k in range(n_extra)
        ]
        for lang in PAGE_HOSTS
    }
    # entity link candidates per lang: page titles + a slice of link-only
    by_lang_titles: dict[str, list[str]] = {lang: [] for lang in PAGE_HOSTS}
    for lang, title in zip(sitelinks["lang"].to_pylist(),
                           sitelinks["page_title"].to_pylist()):
        by_lang_titles[lang].append(title)
    candidates = {
        lang: by_lang_titles[lang] + link_only[lang] for lang in PAGE_HOSTS
    }

    # (qnum, lang, title, family, candidates) work items, deterministic order
    work = []
    for qid, lang, title in zip(
        sitelinks["wikidata_id"].to_pylist(),
        sitelinks["lang"].to_pylist(),
        sitelinks["page_title"].to_pylist(),
    ):
        qnum = int(qid[1:])
        family = fam_min.get(qid, (99, "item"))[1]
        work.append((qnum, lang, title, family, candidates[lang]))
    for lang, titles in link_only.items():
        for k, title in enumerate(titles):
            # chains: each link-only page points at the next two (BFS depth)
            cand = titles[k + 1 : k + 3] or by_lang_titles[lang][:2]
            work.append((1_000_000 + k, lang, title, "item", cand))

    # every page and every image derives from per-key seeded rngs, so the
    # generation is embarrassingly parallel AND bit-identical to the serial
    # path: chunk the work, fan out as Ray tasks when a session is up
    # (corpus generation was the single-threaded long pole for big benches)
    import ray as _ray

    use_ray = _ray.is_initialized()
    chunks = [work[i : i + 2000] for i in range(0, len(work), 2000)]
    if use_ray and len(chunks) > 1:
        fn = _ray.remote(_page_chunk)
        parts = _ray.get([fn.remote(c, image_pool, page_scale) for c in chunks])
    else:
        parts = [_page_chunk(c, image_pool, page_scale) for c in chunks]
    cols = {k: [] for k in (
        "lang", "page_title", "host", "html", "http_status", "api_error",
        "parse_maxlag_fails", "main_image_url", "file_names", "file_mimes",
    )}
    all_files: set[str] = set(_CHROME_POOL) | {HOT_SHARED_IMAGE}
    for part_cols, part_files in parts:
        for k in cols:
            cols[k].extend(part_cols[k])
        all_files.update(part_files)
    pages = pa.table(cols, schema=schema.PAGES_HTML)

    # the authoritative input table (input_hint shape)
    files = sorted(all_files)
    fchunks = [files[i : i + 500] for i in range(0, len(files), 500)]
    if use_ray and len(fchunks) > 1:
        ifn = _ray.remote(_image_chunk)
        iparts = _ray.get([ifn.remote(c) for c in fchunks])
    else:
        iparts = [_image_chunk(c) for c in fchunks]
    img_cols = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for part in iparts:
        for k in img_cols:
            img_cols[k].extend(part[k])
    images = pa.table(img_cols, schema=schema.IMAGES)
    return pages, images


def _page_chunk(work: list[tuple], image_pool: list[str], page_scale: int):
    """Render one chunk of (qnum, lang, title, family, candidates) work
    items (pure function of per-key seeds — parallel-safe, deterministic)."""
    cols = {k: [] for k in (
        "lang", "page_title", "host", "html", "http_status", "api_error",
        "parse_maxlag_fails", "main_image_url", "file_names", "file_mimes",
    )}
    files: set[str] = set()
    for qnum, lang, title, family, cand in work:
        html, file_names, main_image_url = _page_html(
            qnum, lang, family, image_pool, page_scale, link_candidates=cand
        )
        if qnum % 59 == 0:
            status, api_error = 503, ""
        elif qnum % 53 == 0 and lang == "fr":
            status, api_error = 200, "missingtitle"
        else:
            status, api_error = 200, ""
        parse_fails = 1 if qnum % 43 == 0 else (3 if qnum % 97 == 0 else 0)
        cols["lang"].append(lang)
        cols["page_title"].append(title)
        cols["host"].append(PAGE_HOSTS[lang])
        cols["html"].append(html)
        cols["http_status"].append(status)
        cols["api_error"].append(api_error)
        cols["parse_maxlag_fails"].append(parse_fails)
        cols["main_image_url"].append(main_image_url)
        cols["file_names"].append(file_names)
        cols["file_mimes"].append([mime_for(f) for f in file_names])
        files.update(file_names)
    return cols, files


def _image_chunk(file_names: list[str]) -> dict:
    """Encode one chunk of image files (per-file seeded — parallel-safe)."""
    img_cols = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for fn in file_names:
        r = _rng("pixels", fn)
        w = int(r.integers(16, 64))
        h = int(r.integers(16, 64))
        # structured content: gradient + seeded low-frequency pattern
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
        wave = (127 + 120 * np.sin(xx / 7.0 + float(r.random()) * 6.28)
                * np.cos(yy / 5.0)).astype(np.uint8)
        flat = np.full((h, w), int(r.integers(0, 256)), dtype=np.uint8)
        px = np.stack([base, wave, flat], axis=2)
        fmt = "jpeg" if _h("fmt", fn) % 3 == 0 else "png"
        data = codec.encode(px, fmt)
        img_cols["image_id"].append(fn)
        img_cols["bytes"].append(data)
        img_cols["w"].append(w)
        img_cols["h"].append(h)
        img_cols["fmt"].append(fmt)
        img_cols["caption"].append(_caption_text(fn))
        img_cols["phash"].append(codec.phash64(px))
    return img_cols


# ---------------------------------------------------------------- entry


def generate(out_dir: str, n_entities: int = 200, seed: int = 42,
             page_scale: int = 1) -> dict:
    """Generate the virtual wiki under ``out_dir``; returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    seeds = _make_seeds(n_entities, seed)
    sitelinks = _make_sitelinks(n_entities, seed)
    pages, images = _make_pages_and_images(seeds, sitelinks, seed, page_scale)
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(sitelinks, os.path.join(out_dir, "sitelinks.parquet"))
    pq.write_table(pages, os.path.join(out_dir, "pages_html.parquet"),
                   row_group_size=CORPUS_ROW_GROUP)
    pq.write_table(images, os.path.join(out_dir, "images.parquet"),
                   row_group_size=CORPUS_ROW_GROUP)
    manifest = {
        "n_entities": n_entities,
        "seed": seed,
        "synth_version": SYNTH_VERSION,
        "page_scale": page_scale,
        "robots_disallow": ROBOTS_DISALLOW,
        "counts": {
            "seeds": seeds.num_rows,
            "sitelinks": sitelinks.num_rows,
            "pages_html": pages.num_rows,
            "images": images.num_rows,
        },
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


if __name__ == "__main__":  # pragma: no cover
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vwiki"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    print(json.dumps(generate(out, n), indent=1))
