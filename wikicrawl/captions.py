"""Image caption extraction from rendered page HTML.

Semantics ported from the reference's ``_caption_from_soup`` walk
(``/root/reference/wikipedia_images.py:409-522``), on the stdlib mini-DOM.

The image is located by its filename: preferably via the parent
``<a class="mw-file-description">`` href (URL-decoded, ``File:``/``Fichier:``
suffix match, space/underscore normalized), else by src/alt substring. Then
ancestors are walked for exactly five caption markers, each DEFINITIVE —
if a marker's expected caption element is missing, the answer is ``""``
(never inherit a broader ancestor caption), with one exception: a ``thumb``
without a ``thumbcaption`` keeps walking (it may sit inside a gallerybox).

Markers: figure/figcaption; gallerybox/gallerytext; thumb/thumbcaption
(keep walking when absent); infobox-image/infobox-caption (including the
next-``<tr>`` lookup); fr ``div.images`` + following-sibling ``div.legend``.
"""

from __future__ import annotations

import os
import re
import urllib.parse
from typing import Optional

from wikicrawl.minidom import Node

_MW_FILE_DESC = re.compile(r"\bmw-file-description\b")
_GALLERYTEXT = re.compile(r"\bgallerytext\b")
_THUMBCAPTION = re.compile(r"\bthumbcaption\b")
_INFOBOX_CAPTION = re.compile(r"\binfobox-caption\b")
_LEGEND = re.compile(r"\blegend\b")


def filename_from_url(image_url: str) -> str:
    """Basename of the URL path, percent-decoded (ref: images.py:551-555)."""
    path = urllib.parse.urlparse(image_url).path
    return urllib.parse.unquote(os.path.basename(path))


def _find_image(root: Node, filename: str, filename_underscored: str) -> Optional[Node]:
    def href_targets(href: str) -> bool:
        if not href:
            return False
        try:
            decoded = urllib.parse.unquote(href)
        except Exception:
            decoded = href
        return decoded.endswith(":" + filename) or decoded.endswith(
            ":" + filename_underscored
        )

    def matches(tag: Node) -> bool:
        if tag.name != "img":
            return False
        parent_a = tag.find_parent("a", class_=_MW_FILE_DESC)
        if parent_a is not None:
            return href_targets(parent_a.get("href") or "")
        src = tag.get("src") or ""
        alt = tag.get("alt") or ""
        return (
            filename in src
            or filename in alt
            or filename_underscored in src
            or filename_underscored in alt
        )

    return root.find(matches)


def caption_for_image(root: Optional[Node], filename: str) -> str:
    """Caption for the image named ``filename`` in the parsed page, or ``""``."""
    if root is None or not filename:
        return ""
    filename_underscored = filename.replace(" ", "_")
    img = _find_image(root, filename, filename_underscored)
    if img is None:
        return ""

    node: Optional[Node] = img
    while node is not None and node.name is not None:
        classes = node.classes

        if node.name == "figure":
            figcaption = node.find("figcaption")
            if figcaption:
                cleaned = figcaption.get_text(" ", strip=True)
                if cleaned:
                    return cleaned
            return ""

        if "gallerybox" in classes:
            el = node.find(class_=_GALLERYTEXT)
            if el:
                cleaned = el.get_text(" ", strip=True)
                if cleaned:
                    return cleaned
            return ""

        if "thumb" in classes:
            el = node.find(class_=_THUMBCAPTION)
            if el:
                cleaned = el.get_text(" ", strip=True)
                if cleaned:
                    return cleaned
            # fall through: the img may still be inside a gallerybox one level up

        if "infobox-image" in classes:
            el = node.find(class_=_INFOBOX_CAPTION)
            if el:
                cleaned = el.get_text(" ", strip=True)
                if cleaned:
                    return cleaned
            tr = node.find_parent("tr")
            if tr is not None:
                next_tr = tr.find_next_sibling("tr")
                if next_tr is not None:
                    el = next_tr.find(class_=_INFOBOX_CAPTION)
                    if el:
                        cleaned = el.get_text(" ", strip=True)
                        if cleaned:
                            return cleaned
            return ""

        if node.name == "div" and "images" in classes:
            sib = node.find_next_sibling("div", class_=_LEGEND)
            if sib is not None:
                cleaned = sib.get_text(" ", strip=True)
                if cleaned:
                    return cleaned
            return ""

        node = node.parent

    return ""
