"""Scalar utils ports, multimodal image stages, decode audit, crawl_one."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from wikicrawl import codec
from wikicrawl.stages.image_stages import (
    DecodeImages,
    ImageFeatures,
    ResizeImages,
    SampleVideoFrames,
    box_resize,
    decode_audit,
)
from wikicrawl.utils import (
    convert_seconds_to_duration,
    derive_thumb_url_from_original,
    extract_lang_text_from_html,
    f_string,
    field_string_to_array,
    get_filename_from_url,
    strip_html,
)


def test_scalar_utils():
    assert f_string(None) == ""
    assert f_string(5) == "5"
    assert field_string_to_array("a, b|c ,,") == ["a", "b", "c"]
    assert field_string_to_array("") == []
    assert convert_seconds_to_duration(0) == "0s"
    assert convert_seconds_to_duration(61) == "1m 1s"
    assert convert_seconds_to_duration(3661) == "1h 1m 1s"
    assert convert_seconds_to_duration(90061) == "1d 1h 1m 1s"
    assert get_filename_from_url("https://x/y/z/Foo.jpg?a=1") == "Foo.jpg"


def test_thumb_derivation():
    url = "https://upload.wikimedia.org/wikipedia/commons/a/ab/Foo.jpg"
    assert derive_thumb_url_from_original(url, 320) == (
        "https://upload.wikimedia.org/wikipedia/commons/thumb/a/ab/Foo.jpg/320px-Foo.jpg"
    )
    odd = "https://example.org/not/commons/layout.png"
    assert derive_thumb_url_from_original(odd, 320) == odd


def test_html_normalizers():
    assert strip_html("<b>x &amp; y</b>") == "x & y"
    html = '<span lang="fr">légende</span><span lang="en">caption</span>'
    assert extract_lang_text_from_html(html, "fr") == "légende"
    assert extract_lang_text_from_html(html, "en") == "caption"
    assert extract_lang_text_from_html(html, "de") == ""
    assert extract_lang_text_from_html("", "fr") == ""


def _image_batch(n=4):
    rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
    for i in range(n):
        rng = np.random.default_rng(i)
        w, h = 20 + i, 24 + i
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows["image_id"].append(f"img{i}")
        rows["bytes"].append(codec.encode(px, fmt))
        rows["fmt"].append(fmt)
        rows["w"].append(w)
        rows["h"].append(h)
    return pa.table(
        {
            "image_id": pa.array(rows["image_id"]),
            "bytes": pa.array(rows["bytes"], type=pa.binary()),
            "fmt": pa.array(rows["fmt"]),
            "w": pa.array(rows["w"], type=pa.int32()),
            "h": pa.array(rows["h"], type=pa.int32()),
        }
    )


def test_decode_stage_and_features():
    batch = _image_batch()
    out = DecodeImages()(batch)
    assert out["decode_ok"].to_pylist() == [True] * 4
    assert out["decoded_w"].to_pylist() == out["w"].to_pylist()
    feats = ImageFeatures()(batch)
    assert all(p is not None for p in feats["feat_phash"].to_pylist())
    assert all(0 <= v <= 255 for v in feats["mean_r"].to_pylist())


def test_resize_stage_roundtrip():
    batch = _image_batch(2)
    out = ResizeImages(8, 8)(batch)
    for tb in out["thumb_bytes"].to_pylist():
        px = codec.png_decode(tb)
        assert px.shape == (8, 8, 3)
    grad = np.broadcast_to(
        np.linspace(0, 255, 32, dtype=np.uint8)[None, :, None], (32, 32, 3)
    ).copy()
    small = box_resize(grad, 8, 8)
    assert (np.diff(small[0, :, 0].astype(int)) > 0).all()  # gradient preserved


def test_video_rejects_non_container():
    """SampleVideoFrames is a real stage now (WCV containers of PNG
    frames, q78); non-container bytes must fail loudly, not decode."""
    with pytest.raises(ValueError, match="WCV"):
        SampleVideoFrames()(_image_batch(1))


def test_decode_audit_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_image_batch(6))
    res = decode_audit(ds, batch_size=2)
    assert res == {"rows": 6, "decode_ok": 6, "dims_match": 6}


def test_crawl_one(ray_session, tmp_path):
    from wikicrawl.synth import generate
    from wikicrawl.pipelines.crawl_one import crawl_one

    corpus = "/tmp/wikicrawl_test_corpus_t1"
    generate(corpus, n_entities=200, seed=42)
    out = str(tmp_path / "one")
    summary = crawl_one(corpus, out, "Q1", "movie", entity_id="1001")
    assert summary["status"] == "ok"
    from wikicrawl.pipelines.crawl import open_tables

    tables = open_tables(out, 8)
    pages = tables["pages"].read_all().to_pandas()
    assert set(pages.wikidata_id) == {"Q1"}
    assert len(pages) >= 1
    # re-running is idempotent (keyed upsert)
    crawl_one(corpus, out, "Q1", "movie", entity_id="1001")
    assert len(tables["pages"].read_all()) == len(pages)
    with pytest.raises(ValueError):
        crawl_one(corpus, out, "Q1", "nosuchfamily")


def test_thumbnail_gallery_widths():
    """Gallery-of-widths parity with the reference's practical width set
    (ref: wikipedia_images.py:791-839): dense 50..600 + key widths, capped
    at min(orig_w, 2048), unique stable order, original entry last."""
    from wikicrawl.utils import thumbnail_gallery

    url = "https://upload.wikimedia.org/wikipedia/commons/a/ab/Pic.jpg"
    g = thumbnail_gallery(url, 800, 600)
    widths = [i["requested_width"] for i in g if i["kind"] == "thumb"]
    assert widths[:12] == list(range(50, 601, 50))  # dense range intact
    assert 640 in widths and 800 in widths and 1024 not in widths  # capped
    assert len(widths) == len(set(widths))  # unique
    first = g[0]
    assert first["url"].endswith("/thumb/a/ab/Pic.jpg/50px-Pic.jpg")
    assert (first["width"], first["height"]) == (50, 38)  # aspect preserved
    assert g[-1] == {"kind": "original", "requested_width": 800, "url": url,
                     "width": 800, "height": 600}
    # small original: cap below the dense range end
    g2 = thumbnail_gallery(url, 120, 240)
    ws2 = [i["requested_width"] for i in g2 if i["kind"] == "thumb"]
    assert max(ws2) <= 120 and 100 in ws2 and 64 in ws2
    # unknown dims: defaults to the 2048 cap, heights unknown
    g3 = thumbnail_gallery(url, None, None)
    assert any(i["requested_width"] == 1920 for i in g3)
    assert g3[0]["height"] is None


def test_box_resize_matches_per_pixel_loop():
    """The reduceat-vectorized resize must be bit-identical to the
    per-pixel box-average loop it replaced, for downsample, upsample,
    non-divisible ratios and 1px edges."""
    def loop_resize(px, out_w, out_h):
        in_h, in_w, c = px.shape
        ys = (np.arange(out_h + 1) * in_h) // out_h
        xs = (np.arange(out_w + 1) * in_w) // out_w
        out = np.empty((out_h, out_w, c), dtype=np.uint8)
        for i in range(out_h):
            for j in range(out_w):
                block = px[ys[i]:max(ys[i + 1], ys[i] + 1),
                           xs[j]:max(xs[j + 1], xs[j] + 1)]
                out[i, j] = block.mean(axis=(0, 1)).astype(np.uint8)
        return out

    rng = np.random.default_rng(9)
    for in_hw, out_hw in [((37, 53), (16, 16)), ((8, 8), (3, 7)),
                          ((5, 5), (13, 2)), ((1, 17), (4, 4)),
                          ((64, 48), (64, 48))]:
        px = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
        got = box_resize(px, out_hw[1], out_hw[0])
        want = loop_resize(px, out_hw[1], out_hw[0])
        assert np.array_equal(got, want), (in_hw, out_hw)
