"""Section extraction from rendered page HTML.

Semantics ported from the reference's ``extract_titles_and_text``
(``/root/reference/wikipedia_crawler_helpers.py:141-245``), re-implemented on
the stdlib-only mini-DOM (:mod:`wikicrawl.minidom`):

- Intro = all block text before the first ``<h2>`` (never sub-split).
- Split on ``<h2>`` AND ``<h3>`` (``<h4>`` stays inline); an ``<h3>``
  sub-section gets a composite ``"H2 - H3"`` title; the ``<h2>`` lead text
  before the first ``<h3>`` keeps the bare ``<h2>`` title.
- End-matter H2s (References, See also, ... EN+FR) are never sub-split so
  their subsections don't escape downstream exact-title exclusion filters.
- Intra-title spaced hyphens are escaped to en-dashes so the ONLY ``" - "``
  in a composite title is the join separator.
- p/h3/h4 flatten as lines; ul/ol items become ``"\\n- "`` bullets; empty
  sections are dropped; ``"\\n\\n"`` runs collapse.

This is a hot-path operator: it is applied per page inside
``Dataset.map_batches`` (the batch fn parses each page's HTML once and the
parsed DOM is shared with the caption extractor — see
:mod:`wikicrawl.stages.extract`).
"""

from __future__ import annotations

from typing import Optional

from wikicrawl.minidom import Node, parse_html

# Bottom-of-page H2 titles that must never be sub-split on <h3>; compared
# case-insensitively. (ref: wikipedia_crawler_helpers.py:141-148)
NO_SUBSPLIT_SECTION_TITLES = frozenset(
    {
        # EN
        "references",
        "see also",
        "external links",
        "further reading",
        "notes and references",
        "notes",
        "bibliography",
        "citations",
        "sources",
        # FR
        "références",
        "voir aussi",
        "liens externes",
        "notes et références",
        "bibliographie",
    }
)


def _block_text(acc: str, el: Node) -> str:
    """Append one block element's flattened text (ref: helpers.py:151-169)."""
    name = el.name
    if name in ("p", "h3", "h4"):
        text = el.get_text()
        if text:
            acc += "\n" + text + " "
    elif name in ("ul", "ol"):
        for li in el.find_all("li", recursive=True):
            acc += "\n- " + " ".join(t.strip() for t in li.strings if t.strip())
    return acc


def _clean(text: str) -> str:
    text = text.strip()
    while "\n\n" in text:
        text = text.replace("\n\n", "\n")
    return text


def escape_heading_separator(title: str) -> str:
    """Intra-title ``" - "`` -> ``" – "`` (ref: helpers.py:179-193)."""
    return title.replace(" - ", " – ")


def extract_sections(
    html: Optional[str] = None, root: Optional[Node] = None
) -> list[tuple[str, str]]:
    """Rendered HTML -> ``[(section_title, section_text), ...]``.

    Pass ``root`` (a pre-parsed document) to reuse one parse for both section
    and caption extraction.
    """
    if root is None:
        root = parse_html(html)
    body = root.find("body") or root
    h2s = root.find_all("h2")
    first_h2 = h2s[0] if h2s else None

    out: list[tuple[str, str]] = []

    # Intro: every descendant block before the first <h2>, document order.
    acc = ""
    for el in body.find_all(recursive=True):
        if el is first_h2 or el.name == "h2":
            break
        acc = _block_text(acc, el)
    out.append(("Intro", _clean(acc)))

    for h2 in h2s:
        h2_title = escape_heading_separator(h2.get_text().strip())
        no_subsplit = h2_title.lower() in NO_SUBSPLIT_SECTION_TITLES
        current_title = h2_title  # the H2 lead keeps the bare H2 title
        acc = ""
        for el in h2.find_all_next():
            if el.name == "h2":
                break
            if el.name == "h3" and not no_subsplit:
                cleaned = _clean(acc)
                if cleaned:
                    out.append((current_title, cleaned))
                h3_title = escape_heading_separator(el.get_text().strip())
                current_title = f"{h2_title} - {h3_title}" if h3_title else h2_title
                acc = ""
                continue
            acc = _block_text(acc, el)
        cleaned = _clean(acc)
        if cleaned:
            out.append((current_title, cleaned))
    return out


def extract_format_line(section_content: str) -> str:
    """French movie ``Fiche technique`` -> the ``Format`` line.

    (ref: wikipedia_page_writer.py:357-388) Substring between ``"\\n- Format"``
    (fallback ``"- Format"``) and the next ``"\\n- "``; leading ``": "`` removed.
    """
    begin = "\n- Format"
    idx = section_content.find(begin)
    if idx == -1:
        begin = "- Format"
        idx = section_content.find(begin)
    line = ""
    if idx != -1:
        idx += len(begin)
        end = section_content.find("\n- ", idx)
        if end != -1:
            line = section_content[idx:end].strip()
        else:
            line = section_content[idx:].strip()
    if line.startswith(": "):
        line = line[2:]
    return line
