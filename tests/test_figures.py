"""Image-text pair mining + interleaved multimodal export goldens."""

from pyspark.sql import functions as F


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return df.withColumn("html", F.col("html").cast("binary"))


def test_figure_pairs_and_inline_pairs(spark):
    from mindocr_spark.functions.figures import extract_figures

    html = (
        '<p>intro</p>'
        '<figure><img src="/a.jpg" alt="a photo">'
        '<figcaption> A  sunset </figcaption></figure>'
        '<img src="https://cdn.example/b.png" alt="logo">'
        '<img src="/spacer.gif" alt="">'
    )
    out = extract_figures(
        _pages(spark, [("https://s.example/p", html)])).collect()
    by_kind = {r["kind"]: r for r in out}
    assert len(out) == 2  # spacer dropped
    fig = by_kind["figure"]
    assert fig["img_url"] == "https://s.example/a.jpg"
    assert fig["alt"] == "a photo"
    assert fig["caption"] == "A sunset"  # ws-normalized
    inl = by_kind["inline"]
    assert inl["img_url"] == "https://cdn.example/b.png"
    assert inl["caption"] is None


def test_srcset_picks_largest_width_and_falls_back(spark):
    from mindocr_spark.functions.figures import extract_figures

    html = (
        '<img src="/s.jpg" srcset="/s-320.jpg 320w, /s-1280.jpg 1280w,'
        ' /s-640.jpg 640w" alt="x">'
        '<img src="/d.jpg" srcset="/d-2x.jpg 2x" alt="y">'
    )
    out = {r["alt"]: r["img_url"] for r in extract_figures(
        _pages(spark, [("https://h.example/", html)])).collect()}
    assert out["x"] == "https://h.example/s-1280.jpg"
    # density descriptors carry no absolute width -> fall back to src
    assert out["y"] == "https://h.example/d.jpg"


def test_captioned_figure_with_empty_alt_is_kept(spark):
    from mindocr_spark.functions.figures import extract_figures

    html = ('<figure><img src="/a.jpg" alt="">'
            '<figcaption>kept</figcaption></figure>')
    out = extract_figures(
        _pages(spark, [("https://h.example/", html)])).collect()
    assert len(out) == 1 and out[0]["caption"] == "kept"


def test_interleaved_order_and_reindex(spark):
    from mindocr_spark.functions.figures import interleaved_media

    html = (
        '<p>one</p>'
        '<img src="/drop.gif" alt="">'      # dropped -> re-index
        '<figure><img src="/f.jpg" alt="f"></figure>'
        '<p>two</p>'
    )
    out = interleaved_media(
        _pages(spark, [("https://h.example/", html)])).collect()
    seq = [(r["seq_idx"], r["kind"], r["content"]) for r in
           sorted(out, key=lambda r: r["seq_idx"])]
    assert seq == [
        (0, "text", "one"),
        (1, "image", "https://h.example/f.jpg"),
        (2, "text", "two"),
    ]


def test_figure_img_never_double_counts(spark):
    from mindocr_spark.functions.figures import interleaved_media

    html = ('<figure><img src="/f.jpg" alt="f">'
            '<figcaption>c</figcaption></figure>')
    out = interleaved_media(
        _pages(spark, [("https://h.example/", html)])).collect()
    assert len(out) == 1 and out[0]["kind"] == "image"


def test_imgless_figure_and_sourceless_img_dropped(spark):
    """Review regression: a figure with no <img> (or an img with no
    src/srcset) must NOT fabricate origin+'/' as an image URL."""
    from mindocr_spark.functions.figures import (
        extract_figures,
        interleaved_media,
    )

    html = ('<figure><figcaption>Table 1: results</figcaption></figure>'
            '<img alt="floating alt, no src">')
    pages = _pages(spark, [("https://h.example/p", html)])
    assert extract_figures(pages).count() == 0
    assert interleaved_media(pages).where("kind = 'image'").count() == 0


def test_data_alt_attribute_not_stolen(spark):
    """Review regression: data-alt / data-srcset must not satisfy the
    alt / srcset attribute extraction."""
    from mindocr_spark.functions.figures import extract_figures

    html = ('<img data-alt="thumb" src="/a.jpg" alt="real caption">'
            '<img data-srcset="tiny.jpg 10w" src="/full.jpg" alt="y">')
    out = {r["alt"]: r["img_url"] for r in extract_figures(
        _pages(spark, [("https://h.example/", html)])).collect()}
    assert "real caption" in out
    assert out["y"] == "https://h.example/full.jpg"
