"""MediaWiki UI-chrome / template-decoration filename filter.

Semantics ported from the reference (``/root/reference/wikipedia_images.py:92-289``).
The pattern inventory below IS the spec — every regex was derived from the
reference's production audits (WIKIPEDIA-CRAWLER-019/021), including the
documented false-positive near-misses that must NOT match
(``Crystal_Pite.jpg``, ``Emblem_of_New_Caledonia.svg``,
``X_Marks_the_Spot_poster.jpg``, ``Portal_2_Official_Logo.png``, ...).

Three rule families, applied to the bare filename AND (when present) to the
filename with its thumbnail prefix ``(lang..-)?\\d+px-`` stripped:

1. anchored prefixes (always chrome)
2. icon-set families gated on a ``.svg``/``.png`` extension (their leading
   token is also an ordinary word / proper noun)
3. anywhere-substring conventions (currently just ``disambig``)

Used in two places, like the reference: on Action-API ``File:`` titles before
imageinfo resolution, and on lead-image URLs (``is_acceptable_main_image_url``).
Both are applied vectorized per Arrow batch in the extract stage.
"""

from __future__ import annotations

import re
import urllib.parse

_I = re.IGNORECASE

# Family 1 — anchored prefixes. (ref: wikipedia_images.py:97-130)
_ANCHORED = [
    r"^OOjs_UI_icon_",
    r"^(Commons|Wikidata|Wikiquote|Wikisource|Wikibooks|Wikinews|"
    r"Wikiversity|Wikivoyage|Wiktionary|Wikimedia|Wikipedia)-logo",
    # page-protection padlocks are always colour-named; Lock-of-Youth.jpg is real
    r"^(Padlock|Lock)-(green|blue|red|yellow|silver|gray|grey|pink|"
    r"purple|black|white|semi|full|protect|move|office|pp)",
    r"^(Ambox|Imbox|Tmbox|Cmbox|Ombox|Fmbox)",
    r"^Stub_icon",
    r"^Disambig",
    r"^Question_book",
    r"^Wiki_letter_w",
    r"^\d{4}-[a-z]{2}\.wp-",
    r"^Edit-(clear|copy|undo|redo|paste|cut|find)",
    r"^(Merge|Split)-(arrow|split|transwiki)",
    r"^(Information|Warning|Error)[-_]?icon",
    r"^Text_document_with",
    r"^Cscr-",
    r"^Translation_(to_[a-z]{2,}_)?arrow",
    r"^(Increase|Decrease|Steady)2?\.svg$",
    r"^Yes_check[._]",
    r"^X_mark[._]",  # NOT X_Marks_the_Spot_poster.jpg
    r"^Magnify-clip",
    r"^Broom_icon",  # NOT Broome_LGA_WA.png
    r"^Searchtool[._]",
    r"^Speaker_Icon[._]",
]

# Family 2 — icon-set members, gated on flat-graphic extensions.
# (ref: wikipedia_images.py:146-171)
_ICONSET = [
    r"^(Blue|Red|Green)_pencil",
    r"^Nuvola[-_]",
    r"^Crystal_(Clear|Project|128|kcontrol|kpackage|energy|personal)[._]",
    r"^Gnome-(mime|dev|fs|applications|document|settings|system|"
    r"searchtool|globe|html|text|audio|video|image|colors)",
    r"^Oxygen\d",
    r"^Emblem-(money|risk|relax|question|web|WikiVote|important|notice|"
    r"star|package|photos|documents|downloads|favorite|generic|mail|new|"
    r"readonly|shared|system|unreadable|urgent|symbolic|art|music|video)",
    r"^Symbol_\w+_(class|vote)[._]",
    r"^Symbol_(confirmed|question|redirect|neutral|merge|move|comment|"
    r"declined|related)[._]",
    r"^Portal-puzzle",
    r"^Portal_[\w%.]+_[Ii]con\.svg$",
]

# Family 3 — anywhere-substring conventions. (ref: wikipedia_images.py:235-237)
_SUBSTRING = [r"disambig"]

_ANCHORED_RX = [re.compile(p, _I) for p in _ANCHORED]
_ICONSET_RX = [re.compile(p, _I) for p in _ICONSET]
_SUBSTRING_RX = [re.compile(p, _I) for p in _SUBSTRING]

_ICONSET_EXTENSIONS = (".svg", ".png")

# thumbnail prefix: .../thumb/.../langfr-960px-Blue_pencil.svg.png
# (ref: wikipedia_images.py:205)
_THUMB_PREFIX = re.compile(r"^(lang[a-z-]+-)?\d+px-", _I)


def matches_chrome(name: str) -> bool:
    """Apply all three rule families to a normalized bare filename.

    (ref: wikipedia_images.py:240-257) Both the raw name and the
    thumbnail-prefix-stripped name are tested; the extension gate for the
    icon-set family accepts either candidate's extension (a thumbnail of an
    svg icon is a png rendering of it).
    """
    candidates = [name]
    stripped = _THUMB_PREFIX.sub("", name, count=1)
    if stripped != name:
        candidates.append(stripped)
    for cand in candidates:
        if any(rx.search(cand) for rx in _SUBSTRING_RX):
            return True
        if any(rx.match(cand) for rx in _ANCHORED_RX):
            return True
        if cand.lower().endswith(_ICONSET_EXTENSIONS) or name.lower().endswith(
            _ICONSET_EXTENSIONS
        ):
            if any(rx.match(cand) for rx in _ICONSET_RX):
                return True
    return False


def is_ui_chrome_file(title: str) -> bool:
    """Namespaced ``File:``/``Fichier:`` title -> chrome? Spaces normalized to
    underscores first (Action API returns display form, patterns are in
    underscore form). (ref: wikipedia_images.py:176-194)"""
    if not title:
        return False
    name = title.split(":", 1)[1] if ":" in title else title
    return matches_chrome(name.replace(" ", "_"))


def is_ui_chrome_url(image_url: str) -> bool:
    """URL-facing twin: last path segment, query-stripped, percent-decoded.
    (ref: wikipedia_images.py:260-272)"""
    if not image_url:
        return False
    name = urllib.parse.unquote(image_url.split("?", 1)[0].rsplit("/", 1)[-1])
    return matches_chrome(name.replace(" ", "_"))


def is_acceptable_main_image_url(image_url: str) -> bool:
    """A lead image may be stored as a main image unless it is chrome; an empty
    URL is never acceptable. There is deliberately NO first-page-image
    fallback anywhere in the engine (ref: wikipedia_images.py:275-289,
    wikipedia_page_writer.py:238-262)."""
    if not image_url:
        return False
    return not is_ui_chrome_url(image_url)
