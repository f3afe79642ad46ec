"""UI-chrome filter parity — the documented true/false positives from the
reference's production audits (wikipedia_images.py:97-257)."""

from wikicrawl.chrome import (
    is_acceptable_main_image_url,
    is_ui_chrome_file,
    is_ui_chrome_url,
    matches_chrome,
)

CHROME = [
    "OOjs_UI_icon_edit-ltr-progressive.svg",
    "Commons-logo.svg",
    "Wikidata-logo.svg",
    "Padlock-silver.svg",
    "Ambox_important.svg",
    "Stub_icon.svg",
    "Disambig_gray.svg",
    "Question_book-new.svg",
    "Wiki_letter_w.svg",
    "2017-fr.wp-orange-source.svg",
    "Edit-clear.svg",
    "Merge-arrow.svg",
    "Information_icon.svg",
    "Text_document_with_red_question_mark.svg",
    "Cscr-featured.svg",
    "Translation_to_english_arrow.svg",
    "Increase2.svg",
    "Yes_check.svg",
    "X_mark.svg",
    "Magnify-clip.png",
    "Broom_icon.svg",
    "Searchtool.svg",
    "Speaker_Icon.svg",
    # icon-set families (flat-graphic extension gate)
    "Blue_pencil.svg",
    "Nuvola_apps_kaboodle.svg",
    "Crystal_Clear_app_kedit.svg",
    "Gnome-mime-sound-openclipart.svg",
    "Oxygen480-actions-help-about.svg",
    "Emblem-important.svg",
    "Symbol_book_class.svg",
    "Symbol_confirmed.svg",
    "Portal-puzzle.svg",
    "Logo_disambig.svg",  # substring rule: 158212 rows in production
    # thumbnail prefixes of chrome (WIKIPEDIA-CRAWLER-021)
    "langfr-960px-Blue_pencil.svg.png",
    "120px-Commons-logo.svg.png",
]

LEGIT = [
    # the audit's hard-won false-positive set — MUST pass through
    "Crystal_Pite.jpg",
    "Emblem_of_New_Caledonia.svg",
    "Symbol_of_Tokyo_Metropolis.svg",
    "X_Marks_the_Spot_poster.jpg",
    "Portal_2_Official_Logo.png",
    "GNOME_Shell.png",
    "Broome_LGA_WA.png",
    "Crystal_Waters_-_Storyteller_cover.png",
    "Lock-of-Youth.jpg",
    "Lock-jaw_2857.jpg",
    "Emblem-Ramakrishna-Mission-Transparent.png",
    # *_icon suffix rule was deliberately REMOVED (frequency separates, names don't)
    "GPT-5.1_icon.png",
    "Konami_logo_icon.svg",
    "Emmy_Icon.png",
    "Changan_icon.svg",
    "Citizen_Kane_poster.jpg",
]


def test_chrome_positives():
    for name in CHROME:
        assert matches_chrome(name), name


def test_chrome_negatives():
    for name in LEGIT:
        assert not matches_chrome(name), name


def test_namespaced_titles_and_display_form():
    assert is_ui_chrome_file("File:OOjs UI icon edit-ltr-progressive.svg")
    assert is_ui_chrome_file("Fichier:Commons-logo.svg")
    assert not is_ui_chrome_file("File:Citizen Kane poster.jpg")
    assert not is_ui_chrome_file("")


def test_url_twin_decodes_and_strips_query():
    assert is_ui_chrome_url(
        "https://upload.wikimedia.org/wikipedia/commons/3/3d/Blue_pencil.svg?x=1"
    )
    assert is_ui_chrome_url(
        "https://upload.wikimedia.org/wikipedia/commons/thumb/3/3d/"
        "Blue_pencil.svg/langfr-960px-Blue_pencil.svg.png"
    )
    assert not is_ui_chrome_url(
        "https://upload.wikimedia.org/wikipedia/commons/a/ab/Crystal_Pite.jpg"
    )


def test_acceptable_main_image():
    assert is_acceptable_main_image_url("https://up.wm.org/a/ab/Kane.jpg")
    assert not is_acceptable_main_image_url("https://up.wm.org/a/ab/Commons-logo.svg")
    assert not is_acceptable_main_image_url("")
