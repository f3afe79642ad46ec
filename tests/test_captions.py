"""Caption-walker semantics (parity with _caption_from_soup,
wikipedia_images.py:409-515 — all five markers + the definitive-marker and
keep-walking-on-thumb subtleties)."""

from wikicrawl.captions import caption_for_image, filename_from_url
from wikicrawl.minidom import parse_html


def wrap(fn, inner):
    return (
        f'<a class="mw-file-description" href="/wiki/File:{fn}">'
        f'<img src="//up/x/{fn}"></a>'
    ) if inner is None else inner


def test_figure_figcaption():
    html = (
        '<body><figure><a class="mw-file-description" href="/wiki/File:A.jpg">'
        '<img src="//up/A.jpg"></a><figcaption> The  caption </figcaption>'
        "</figure></body>"
    )
    # bs4 get_text(" ", strip=True) strips each text node's ends only;
    # internal runs of whitespace survive — parity preserved here.
    assert caption_for_image(parse_html(html), "A.jpg") == "The  caption"


def test_figure_without_figcaption_is_definitive_empty():
    html = (
        '<body><figure><a class="mw-file-description" href="/wiki/File:A.jpg">'
        '<img src="//up/A.jpg"></a></figure>'
        '<div class="thumbcaption">outer</div></body>'
    )
    assert caption_for_image(parse_html(html), "A.jpg") == ""


def test_gallerybox_gallerytext():
    html = (
        '<body><li class="gallerybox"><div>'
        '<a class="mw-file-description" href="/wiki/Fichier:B.png">'
        '<img src="//up/B.png"></a></div>'
        '<div class="gallerytext">Gallery cap</div></li></body>'
    )
    assert caption_for_image(parse_html(html), "B.png") == "Gallery cap"


def test_thumb_thumbcaption():
    html = (
        '<body><div class="thumb tright"><div>'
        '<a class="mw-file-description" href="/wiki/File:C.jpg">'
        '<img src="//up/C.jpg"></a>'
        '<div class="thumbcaption">Thumb cap</div></div></div></body>'
    )
    assert caption_for_image(parse_html(html), "C.jpg") == "Thumb cap"


def test_captionless_thumb_keeps_walking_to_gallerybox():
    # wikipedia_images.py:479-486: a thumb without thumbcaption must not stop
    # the walk when a gallerybox sits above it.
    html = (
        '<body><li class="gallerybox"><div class="thumb">'
        '<a class="mw-file-description" href="/wiki/File:D.jpg">'
        '<img src="//up/D.jpg"></a></div>'
        '<div class="gallerytext">From gallery</div></li></body>'
    )
    assert caption_for_image(parse_html(html), "D.jpg") == "From gallery"


def test_infobox_image_same_cell():
    html = (
        '<body><table><tr><td class="infobox-image">'
        '<a class="mw-file-description" href="/wiki/File:E.jpg">'
        '<img src="//up/E.jpg"></a>'
        '<div class="infobox-caption">Infobox cap</div></td></tr></table></body>'
    )
    assert caption_for_image(parse_html(html), "E.jpg") == "Infobox cap"


def test_infobox_image_next_tr():
    html = (
        '<body><table><tr><td class="infobox-image">'
        '<a class="mw-file-description" href="/wiki/File:F.jpg">'
        '<img src="//up/F.jpg"></a></td></tr>'
        '<tr><td><div class="infobox-caption">Next-row cap</div></td></tr>'
        "</table></body>"
    )
    assert caption_for_image(parse_html(html), "F.jpg") == "Next-row cap"


def test_infobox_decorative_icon_gets_no_caption():
    # A decorative icon inside an infobox row must NOT inherit the lead
    # image's caption (the definitive-marker rule).
    html = (
        '<body><table><tr><td class="infobox-image">'
        '<a class="mw-file-description" href="/wiki/File:Lead.jpg">'
        '<img src="//up/Lead.jpg"></a>'
        '<div class="infobox-caption">Lead cap</div></td></tr>'
        '<tr><td class="infobox-image">'
        '<a class="mw-file-description" href="/wiki/File:Icon.svg">'
        '<img src="//up/Icon.svg"></a></td></tr></table></body>'
    )
    root = parse_html(html)
    assert caption_for_image(root, "Lead.jpg") == "Lead cap"
    assert caption_for_image(root, "Icon.svg") == ""


def test_fr_images_legend():
    html = (
        '<body><div class="images">'
        '<a class="mw-file-description" href="/wiki/Fichier:G.jpg">'
        '<img src="//up/G.jpg"></a></div>'
        '<div class="legend">Légende FR</div></body>'
    )
    assert caption_for_image(parse_html(html), "G.jpg") == "Légende FR"


def test_href_matching_underscores_and_percent():
    html = (
        '<body><figure><a class="mw-file-description" '
        'href="/wiki/File:My%20Name.jpg"><img src="//up/My_Name.jpg"></a>'
        "<figcaption>pc</figcaption></figure></body>"
    )
    # display-form filename with a space matches the percent-encoded href
    assert caption_for_image(parse_html(html), "My Name.jpg") == "pc"


def test_src_alt_fallback_when_no_wrapper():
    html = '<body><figure><img src="//up/H.jpg" alt="x"><figcaption>fc</figcaption></figure></body>'
    assert caption_for_image(parse_html(html), "H.jpg") == "fc"


def test_missing_image_returns_empty():
    assert caption_for_image(parse_html("<body><p>t</p></body>"), "Z.jpg") == ""
    assert caption_for_image(None, "Z.jpg") == ""
    assert caption_for_image(parse_html("<body></body>"), "") == ""


def test_filename_from_url():
    assert filename_from_url("https://up.wm.org/wikipedia/commons/a/ab/My%20File.jpg") == "My File.jpg"
