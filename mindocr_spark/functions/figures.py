"""figures — image-text pair mining and interleaved multimodal export
from raw HTML: the web-scale feedstock of vision-language training
(LAION-style alt/caption pairs, MMC4/OBELICS-style interleaved
text+image sequences).

Everything is one family of codegen regex passes over the scanned
html — no DOM library, no Python in the hot path (the extract_links /
extract_anchors discipline). Image URLs resolve against the page
origin and responsive ``srcset`` attributes pick the LARGEST width
candidate (the variant a training pipeline wants to fetch).

Reference analog: det→rec hand-off — detect the region (figure / img
tag), then recognize its text payload (alt, figcaption)
(reference: tools/infer/text/predict_system.py:72-90).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mindocr_spark.functions.links import resolve_href

#: Figure block (single regex family shared by both operators). (?s)
#: lets captions span line breaks in real crawl HTML.
FIGURE_RE = r"(?s)<figure>.*?</figure>"
IMG_RE = r"<img[^>]*>"
FIGCAPTION_RE = r"(?s)<figcaption>(.*?)</figcaption>"
#: srcset candidate: "url 480w" (width descriptors only; density
#: descriptors (2x) carry no absolute size and fall back to src)
SRCSET_CAND_RE = r"([^\s,]+)\s+(\d+)w"
#: Interleaved document order: figures FIRST in the alternation so an
#: img inside a figure can never match as a bare img.
SEQ_RE = r"(?s)(<figure>.*?</figure>|<p>.*?</p>|<img[^>]*>)"

_ORIGIN_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def _attr(tag: Column, name: str) -> Column:
    # leading whitespace anchor: without it, name="alt" would match
    # INSIDE data-alt="…" (lazy-loader crawl HTML) and steal the value
    return F.regexp_extract(tag, f'\\s{name}="([^"]*)"', 1)


def _ws_norm(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _best_src(tag: Column) -> Column:
    """srcset-aware source selection: the candidate with the LARGEST
    width descriptor, falling back to ``src`` when no width candidates
    exist. array_max over (width, url) structs orders by width first —
    pure JVM higher-order functions, no UDF."""
    srcset = _attr(tag, "srcset")
    cands = F.regexp_extract_all(
        srcset, F.lit(SRCSET_CAND_RE), F.lit(0))
    best = F.array_max(
        F.transform(
            cands,
            lambda s: F.struct(
                F.regexp_extract(s, r"(\d+)w$", 1).cast("int").alias("w"),
                F.regexp_extract(s, r"^([^\s,]+)", 1).alias("u"),
            ),
        )
    )
    raw = F.when(F.size(cands) > 0, best["u"]).otherwise(
        _attr(tag, "src"))
    # NULL (not "") when the tag has no usable source — otherwise
    # resolve_href('') would fabricate origin + "/" for a source-less
    # or img-less figure and a phantom pair would survive the filters
    return F.when(raw != "", raw)


def extract_figures(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → image-text pair relation (url, kind, img_url, alt,
    caption): ``<figure>`` blocks pair their img with the
    whitespace-normalized ``<figcaption>`` (kind='figure'); img tags
    OUTSIDE figures pair with their alt alone (kind='inline',
    caption NULL). Pairs with no text on either side (empty alt, no
    caption) are dropped — a decorative spacer gif is not training
    data. Image URLs resolve against the page origin; srcset picks
    the largest-width candidate.

    100 TB shape: two regexp_extract_all scans (figures, then imgs
    over the figure-stripped html) + narrow explodes + row-local
    attribute regexes — zero shuffles, zero Python."""
    html_s = F.col(html_col).cast("string")
    origin = F.regexp_extract(F.col(url_col), _ORIGIN_RE, 1)
    figs = pages.select(
        F.col(url_col).alias("url"),
        origin.alias("__origin"),
        F.explode(
            F.regexp_extract_all(html_s, F.lit(FIGURE_RE), F.lit(0))
        ).alias("frag"),
    ).select(
        "url", "__origin",
        F.lit("figure").alias("kind"),
        F.regexp_extract("frag", IMG_RE, 0).alias("img_tag"),
        _ws_norm(
            F.regexp_extract("frag", FIGCAPTION_RE, 1)
        ).alias("caption"),
    )
    nofig = F.regexp_replace(html_s, FIGURE_RE, "")
    inline = pages.select(
        F.col(url_col).alias("url"),
        origin.alias("__origin"),
        F.explode(
            F.regexp_extract_all(nofig, F.lit(IMG_RE), F.lit(0))
        ).alias("img_tag"),
    ).select(
        "url", "__origin",
        F.lit("inline").alias("kind"),
        F.col("img_tag"),
        F.lit(None).cast("string").alias("caption"),
    )
    both = figs.unionByName(inline)
    alt = _ws_norm(_attr(F.col("img_tag"), "alt"))
    img_url = resolve_href(_best_src(F.col("img_tag")),
                           F.col("__origin"))
    return both.select(
        "url", "kind",
        img_url.alias("img_url"),
        alt.alias("alt"),
        "caption",
    ).where(
        F.col("img_url").isNotNull()
        & (
            (F.col("alt") != "")
            | (F.coalesce(F.col("caption"), F.lit("")) != "")
        )
    )


def interleaved_media(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → MMC4/OBELICS-style interleaved sequence (url, seq_idx,
    kind, content): paragraphs and images in DOCUMENT ORDER, images
    carried as their resolved best-source URL, text as the
    paragraph's raw inner text. Images with no alt and no caption are
    dropped and the sequence re-indexed (seq_idx is the grain a
    vision-language loader consumes — it must be gap-free).

    100 TB shape: ONE ordered regexp_extract_all scan (figures first
    in the alternation so a figure's img never double-matches), one
    posexplode, row-local classification, and ONE per-url window for
    the post-filter re-index — bounded by per-page element count."""
    html_s = F.col(html_col).cast("string")
    origin = F.regexp_extract(F.col(url_col), _ORIGIN_RE, 1)
    e = pages.select(
        F.col(url_col).alias("url"),
        origin.alias("__origin"),
        F.posexplode(
            F.regexp_extract_all(html_s, F.lit(SEQ_RE), F.lit(0))
        ).alias("pos", "frag"),
    )
    frag = F.col("frag")
    is_text = frag.startswith("<p>")
    img_tag = F.when(
        frag.startswith("<figure>"),
        F.regexp_extract(frag, IMG_RE, 0),
    ).otherwise(frag)
    alt = _ws_norm(_attr(img_tag, "alt"))
    caption = _ws_norm(F.regexp_extract(frag, FIGCAPTION_RE, 1))
    content = F.when(
        is_text,
        F.regexp_extract(frag, r"(?s)<p>(.*)</p>", 1),
    ).otherwise(resolve_href(_best_src(img_tag), F.col("__origin")))
    rows = e.select(
        "url", "pos",
        F.when(is_text, "text").otherwise("image").alias("kind"),
        content.alias("content"),
        ((alt != "") | (caption != "")).alias("__has_text"),
    ).where(
        (F.col("kind") == "text")
        | (F.col("__has_text") & F.col("content").isNotNull())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("pos")
    return rows.select(
        "url",
        (F.row_number().over(w) - 1).cast("bigint").alias("seq_idx"),
        "kind", "content",
    )
