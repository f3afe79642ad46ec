"""Scalar helpers ported from the reference's utility surface
(SURVEY §2.11): field-string splitting, duration humanization, resume-id
normalization, null-to-empty coercion, thumbnail URL derivation, and the
caption-fallback HTML normalizers. SQL escaping has no equivalent here —
there is no SQL string assembly in this engine.
"""

from __future__ import annotations

import os
import re
import urllib.parse
from html import unescape


def f_string(value) -> str:
    """None -> "" (ref: citizenphil.py:495-498)."""
    return "" if value is None else str(value)


def field_string_to_array(value: str) -> list[str]:
    """Split on ``,`` or ``|``, trimming blanks (ref: citizenphil.py:500-510)."""
    if not value:
        return []
    parts = re.split(r"[,|]", value)
    return [p.strip() for p in parts if p.strip()]


def normalize_resume_id(value) -> str:
    """Resume checkpoint value -> SQL-ready id or "" (ref: crawler.py:81-84)."""
    s = f_string(value).strip()
    return s


def convert_seconds_to_duration(total_seconds: int) -> str:
    """Humanize seconds as 'Xd Yh Zm Ws' (ref: citizenphil.py:443-476)."""
    total_seconds = int(total_seconds)
    days, rem = divmod(total_seconds, 86400)
    hours, rem = divmod(rem, 3600)
    minutes, seconds = divmod(rem, 60)
    parts = []
    if days:
        parts.append(f"{days}d")
    if hours or days:
        parts.append(f"{hours}h")
    if minutes or hours or days:
        parts.append(f"{minutes}m")
    parts.append(f"{seconds}s")
    return " ".join(parts)


def derive_thumb_url_from_original(image_url: str, width: int) -> str:
    """Commons upload path -> thumb path (ref: wikipedia_images.py:557-579).

    ``/wikipedia/commons/a/ab/F`` -> ``/wikipedia/commons/thumb/a/ab/F/<w>px-F``;
    non-matching URLs returned unchanged."""
    parsed = urllib.parse.urlparse(image_url)
    m = re.match(
        r"^(?P<prefix>/wikipedia/commons)/(?P<a>[^/]+)/(?P<ab>[^/]+)/(?P<name>[^/]+)$",
        parsed.path,
    )
    if not m:
        return image_url
    thumb = (
        f"{m.group('prefix')}/thumb/{m.group('a')}/{m.group('ab')}/"
        f"{m.group('name')}/{width}px-{m.group('name')}"
    )
    return urllib.parse.urlunparse((parsed.scheme, parsed.netloc, thumb, "", "", ""))


def get_filename_from_url(url: str) -> str:
    """Last path component (ref: wikipedia_images.py:581-583)."""
    return os.path.basename(urllib.parse.urlparse(url).path)


def strip_html(html_text: str) -> str:
    """Tag-strip + entity-unescape (ref: wikipedia_images.py:524-529)."""
    if not html_text:
        return ""
    return unescape(re.sub(r"<[^>]+>", "", html_text)).strip()


def extract_lang_text_from_html(html_text: str, lang: str) -> str:
    """Combine ``lang=<l>``-tagged fragments (ref: wikipedia_images.py:531-549)."""
    if not html_text or not lang:
        return ""
    pattern = re.compile(
        rf"<(?P<tag>[^\s>/]+)[^>]*\blang=['\"]{re.escape(lang)}['\"][^>]*>(?P<inner>.*?)</(?P=tag)>",
        re.IGNORECASE | re.DOTALL,
    )
    matches = [m.group("inner") for m in pattern.finditer(html_text)]
    if not matches:
        return ""
    return "\n".join(strip_html(m) for m in matches).strip()


def thumbnail_gallery(image_url: str, orig_w: int | None,
                      orig_h: int | None) -> list[dict]:
    """Gallery of thumbnail candidates for one image
    (ref: wikipedia_images.py:791-839).

    Same practical width set as the reference — a dense 50..600 range plus
    the common key widths, capped at min(original width, 2048), unique with
    stable ordering — each entry carrying the derived thumb URL and the
    aspect-preserved dimensions (the virtual wiki's dims come from the
    images input table instead of the Commons imageinfo API), plus the
    original as the final entry."""
    max_w = orig_w if isinstance(orig_w, int) else 2048
    max_w = min(max_w, 2048)
    widths = list(range(50, min(max_w, 600) + 1, 50))
    widths += [64, 100, 120, 150, 185, 200, 250, 300, 342, 400, 500, 640,
               800, 1024, 1280, 1600, 1920]
    widths = [w for w in widths if w <= max_w]
    seen: set[int] = set()
    widths = [w for w in widths if not (w in seen or seen.add(w))]

    items: list[dict] = []
    for w in widths:
        thumb = derive_thumb_url_from_original(image_url, w)
        if not thumb:
            continue
        if isinstance(orig_w, int) and isinstance(orig_h, int) and orig_w > 0:
            tw, th = w, max(1, round(orig_h * w / orig_w))
        else:
            tw, th = w, None
        items.append({"kind": "thumb", "requested_width": w, "url": thumb,
                      "width": tw, "height": th})
    if image_url:
        items.append({"kind": "original", "requested_width": orig_w,
                      "url": image_url, "width": orig_w, "height": orig_h})
    return items
