"""Per-(entity, language) fetch + extract: the payload builder.

The Ray-Data engine and the straight-line oracle share this single
implementation, exactly like the reference shares ``f_fetchlangpayload``
between the batch crawler and the single-Qid path
(``wikipedia_page_writer.py:65-190``, module docstring there). The payload is
pure data (network + parse only); persistence happens elsewhere.

Order of operations mirrors the reference:
1. lead image via the summary endpoint (only when the family stores one),
   rejected if UI chrome — and there is NO first-page-image fallback;
2. rendered HTML via the parse endpoint (maxlag-retried, terminal errors
   recorded as row status), parsed ONCE and reused for sections + captions;
3. media item list (chrome-filtered BEFORE imageinfo, mime-filtered), then
   per-item caption from the shared parse.
"""

from __future__ import annotations

from wikicrawl.captions import caption_for_image
from wikicrawl.chrome import is_acceptable_main_image_url, is_ui_chrome_file
from wikicrawl.minidom import parse_html
from wikicrawl.sections import extract_sections
from wikicrawl.synth import commons_title_for, image_url_for, thumb_url_for
from wikicrawl.vwiki import VirtualWiki


def extract_wiki_links(root) -> list[str]:
    """In-body page links: ``<a href="/wiki/Title">`` anchors in document
    order, first occurrence wins, excluding file-description links and
    namespace links (File:/Fichier:). Returns DISPLAY titles (underscores
    decoded back to spaces) — the dynamic-frontier feed (north_star)."""
    import urllib.parse

    seen: set[str] = set()
    out: list[str] = []
    for a in root.find_all("a"):
        href = a.get("href")
        if not href or not href.startswith("/wiki/"):
            continue
        if "mw-file-description" in (a.classes or []):
            continue
        title = urllib.parse.unquote(href[len("/wiki/"):]).replace("_", " ")
        if ":" in title.split(" ")[0]:  # namespace link (File:, Fichier:, ...)
            continue
        if title and title not in seen:
            seen.add(title)
            out.append(title)
    return out


def build_payload(
    wiki: VirtualWiki,
    page_title: str,
    lang: str,
    needs_image: bool,
) -> dict:
    """-> payload dict (site_key, page_url, main_image_url, http_status,
    success, has_content, sections, page_images, requests)."""
    from wikicrawl.canonical import canonical_page_url

    payload = {
        "site_key": lang + "wiki",
        "page_title": page_title,
        "page_url": canonical_page_url(page_title, lang),
        "main_image_url": "",
        "page_images": [],
        "http_status": None,
        "success": False,
        "has_content": False,
        "sections": [],
        "links": [],
        "requests": 0,
    }

    # 1. lead image (summary endpoint) — only for families that store one.
    if needs_image:
        payload["requests"] += 1
        main = wiki.summary_main_image(lang, page_title)
        if main and not is_acceptable_main_image_url(main):
            main = ""  # chrome lead rejected; column stays untouched downstream
        payload["main_image_url"] = main

    # 2. rendered HTML, fetched once; maxlag retried inside the virtual wiki.
    res = wiki.parse(lang, page_title)
    payload["requests"] += res.attempts
    payload["http_status"] = res.http_status
    payload["success"] = res.success

    root = None
    if res.success and res.html:
        payload["has_content"] = True
        root = parse_html(res.html)
        payload["sections"] = extract_sections(root=root)
        payload["links"] = extract_wiki_links(root)

    # 3. media items: chrome filter pre-imageinfo, then mime filter, then
    #    captions from the shared parse (soup=None -> caption "").
    payload["requests"] += 1
    items = wiki.media_items(lang, page_title)
    kept = [
        (fn, mime)
        for fn, mime in items
        if not is_ui_chrome_file(commons_title_for(fn, lang))
    ]
    page_images = []
    for fn, mime in kept:
        if mime and not mime.startswith("image/"):
            continue
        commons_title = commons_title_for(fn, lang)
        file_name = commons_title.split(":", 1)[1]  # display form (spaces)
        url = image_url_for(fn)
        caption = caption_for_image(root, file_name) if root is not None else ""
        page_images.append(
            {
                "display_order": len(page_images) + 1,
                "image_id": fn,  # underscored join key into the images table
                "image_url": url,
                "image_url_normalized": url,
                "thumbnail_url": thumb_url_for(fn),
                "media_type": "image",
                "file_name": file_name,
                "commons_title": commons_title,
                "caption": caption,
            }
        )
    payload["page_images"] = page_images
    return payload
