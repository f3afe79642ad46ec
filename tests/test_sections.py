"""Section-extraction semantics (parity with the reference's
extract_titles_and_text, wikipedia_crawler_helpers.py:141-245 — expected
values hand-derived from that code)."""

from wikicrawl.sections import (
    NO_SUBSPLIT_SECTION_TITLES,
    escape_heading_separator,
    extract_format_line,
    extract_sections,
)

HTML = (
    "<body><p>Lead one.</p><div><p>Nested lead.</p></div>"
    "<h2>History</h2><p>H2 lead text.</p>"
    "<h3>Early</h3><p>Early text.</p><h4>Sub</h4><p>After h4.</p>"
    "<h3>Late - era</h3><ul><li>item one</li><li>item <b>two</b></li></ul>"
    "<h2>References</h2><p>Ref intro.</p><h3>Books</h3><p>Book list.</p>"
    "</body>"
)


def test_full_extraction_shape():
    got = extract_sections(HTML)
    assert got == [
        ("Intro", "Lead one. \nNested lead."),
        ("History", "H2 lead text."),
        ("History - Early", "Early text. \nSub \nAfter h4."),
        ("History - Late – era", "- item one\n- item two"),
        ("References", "Ref intro. \nBooks \nBook list."),
    ]


def test_intro_only_page():
    got = extract_sections("<body><p>Only text.</p></body>")
    assert got == [("Intro", "Only text.")]


def test_empty_sections_dropped():
    html = "<body><p>x</p><h2>Empty</h2><h2>Full</h2><p>y</p></body>"
    got = extract_sections(html)
    assert got == [("Intro", "x"), ("Full", "y")]


def test_no_subsplit_titles_case_insensitive():
    assert "references" in NO_SUBSPLIT_SECTION_TITLES
    html = "<body><h2>SEE ALSO</h2><p>a</p><h3>More</h3><p>b</p></body>"
    got = extract_sections(html)
    # "SEE ALSO" lower-cases into the no-subsplit set -> single section
    assert got == [("Intro", ""), ("SEE ALSO", "a \nMore \nb")]


def test_heading_separator_escape():
    assert escape_heading_separator("2015 - present") == "2015 – present"
    assert escape_heading_separator("1926-1929") == "1926-1929"  # unspaced untouched
    assert escape_heading_separator("A – B") == "A – B"  # existing en-dash untouched


def test_ol_bullets_and_nested_strings():
    html = "<body><h2>L</h2><ol><li> spaced  </li><li>a<i>b</i>c</li></ol></body>"
    got = extract_sections(html)
    assert got == [("Intro", ""), ("L", "- spaced\n- a b c")]


def test_h3_after_no_subsplit_does_not_composite():
    html = "<body><h2>Notes</h2><h3>Inner - part</h3><p>t</p></body>"
    got = extract_sections(html)
    assert got == [("Intro", ""), ("Notes", "Inner - part \nt")]


def test_format_line_extraction():
    content = (
        "- Titre : Foo\n- Format : 35 mm - couleur\n- Pays : France"
    )
    assert extract_format_line(content) == "35 mm - couleur"
    # fallback without leading newline
    assert extract_format_line("- Format : X") == "X"
    # ": " prefix stripped only when present
    assert extract_format_line("\n- Format Y\n- Z") == "Y"
    assert extract_format_line("nothing here") == ""
