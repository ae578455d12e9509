"""corpus — deterministic synthetic Common-Crawl-style page generator.

The graft's replacement for the reference's dataset converters
(reference: tools/dataset_converters/convert.py:32-54) and its
generate-known-content-then-recover system test
(reference: tests/st/test_online_infer.py:17-44): every page is a pure
function of ``(seed, row_index)``, so the corpus can be generated
*distributed* (spark.range → mapInPandas) and *in-process* (golden
fixtures) with bit-identical results, at any scale tier.

Schema (BASELINE input_hint, exact):
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

``text`` holds the generator's known main-content (ground truth the
pipeline must recover); the pipeline never reads it.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random

# Pinned vocabularies. Content words deliberately stopword-rich (the
# scorer's stopword-density feature needs natural-ish prose).
_EN_WORDS = (
    "the quick brown fox jumps over a lazy dog and runs to the river where "
    "it finds an old boat that was left by some travelers who were on their "
    "way to the mountains in search of gold and silver but they found only "
    "stones and cold water so they turned back home with empty hands and "
    "heavy hearts while the wind was blowing from the north across the "
    "valley carrying seeds of wild flowers that will bloom in spring"
).split()
_DE_WORDS = (
    "der schnelle braune fuchs springt uber den faulen hund und lauft zum "
    "fluss wo er ein altes boot findet das von reisenden mit viel gepack "
    "auf dem weg zu den bergen bei nacht aus dem tal nach hause gelassen "
    "wurde und die sonne war noch nicht aufgegangen als sie mit leeren "
    "handen zuruck kamen wie es oft so ist im leben"
).split()
_ZH_CHARS = "山水风月天地人间春秋冬夏江河湖海花鸟虫鱼日月星辰云雨雷电金木水火土东南西北中远近高低大小多少"
_NAV_WORDS = "home about products news blog contact careers login signup help docs pricing team press".split()
_SITE_WORDS = "acme globex initech umbrella hooli stark wayne aperture cyberdyne tyrell".split()

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rng(seed: int, idx: int) -> random.Random:
    h = hashlib.md5(f"{seed}:{idx}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _sentence(r: random.Random, words: list[str], n: int) -> str:
    ws = [r.choice(words) for _ in range(n)]
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _en_paragraph(r: random.Random, words: list[str]) -> str:
    return " ".join(_sentence(r, words, r.randint(8, 22)) for _ in range(r.randint(2, 5)))


def _zh_paragraph(r: random.Random) -> str:
    return "".join(r.choice(_ZH_CHARS) for _ in range(r.randint(60, 220))) + "。"


def _nav_html(r: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w.capitalize()}</a></li>'
        for w in r.sample(_NAV_WORDS, r.randint(4, 8))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _sidebar_html(r: random.Random) -> str:
    items = "".join(
        f'<li><a href="/p/{r.randint(1, 999)}">'
        f"{' '.join(r.choice(_NAV_WORDS) for _ in range(r.randint(2, 4)))}</a></li>"
        for _ in range(r.randint(3, 7))
    )
    return f"<aside><h3>Related</h3><ul>{items}</ul></aside>"


def generate_page(seed: int, idx: int) -> dict:
    """One page, purely from (seed, idx). Returns the input_hint record."""
    r = _rng(seed, idx)
    site = r.choice(_SITE_WORDS)
    url = f"https://{site}{idx % 97}.example/p/{idx}"
    ts = EPOCH + dt.timedelta(seconds=(idx * 9973 + r.randint(0, 3600)) % (365 * 86400))

    roll = r.random()
    lang = "en" if roll < 0.80 else ("de" if roll < 0.90 else "zh")
    words = _EN_WORDS if lang == "en" else _DE_WORDS

    # main content: heading + paragraphs (long tail: rare huge page)
    n_paras = r.randint(1, 8)
    if r.random() < 0.02:
        n_paras *= 40  # skew tail — exercises salting / size-aware batching
    if lang == "zh":
        title = "".join(r.choice(_ZH_CHARS) for _ in range(r.randint(6, 14)))
        paras = [_zh_paragraph(r) for _ in range(n_paras)]
    else:
        title = " ".join(r.choice(words) for _ in range(r.randint(4, 8))).capitalize()
        paras = [_en_paragraph(r, words) for _ in range(n_paras)]

    # a small quota of pages exercising entities in content
    if r.random() < 0.25 and lang != "zh":
        k = r.randrange(len(paras))
        paras[k] = paras[k].replace(" and ", " &amp; ", 1) if " and " in paras[k] else paras[k]

    # ground truth under the spec's normalization: entity-decoded,
    # whitespace-collapsed; heading + paragraphs are one contiguous
    # content run → they form blocks joined per the spec
    from mindocr_spark.extract_core import decode_entities, normalize_ws

    known_nodes = [normalize_ws(decode_entities(p)) for p in [title] + paras]

    charset_roll = r.random()
    meta = '<meta charset="utf-8">'
    encoding = "utf-8"
    if charset_roll < 0.02 and lang != "zh":
        meta = '<meta charset="iso-8859-1">'
        encoding = "latin-1"
    elif charset_roll < 0.10:
        meta = ""  # sniffed utf-8

    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    comment = f"<!-- generated page {idx}; build {r.randint(1000, 9999)} -->"
    script = f"<script>var x={r.randint(0, 1 << 30)};track('{site}');</script>"
    style = "<style>.main{margin:0 auto;max-width:64em}</style>"
    footer = (
        f"<footer><p>&copy; 2024 {site.capitalize()} Inc. "
        f'<a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
    )
    header = f'<header><a href="/">{site.capitalize()}</a></header>'

    html_str = (
        f"<!DOCTYPE html><html><head>{meta}<title>{title} | {site}</title>"
        f"{style}{script}</head><body>{comment}{header}{_nav_html(r)}"
        f"<main><article><h1>{title}</h1>{body_paras}</article></main>"
        f"{_sidebar_html(r)}{footer}</body></html>"
    )
    # adversarial quota (drawn AFTER all content rolls so earlier values
    # are stable): real crawls omit optional end tags and contain tag soup
    mut = r.random()
    if mut < 0.04:
        html_str = html_str.replace("</head>", "", 1)  # HTML5 implicit close
    elif mut < 0.07:
        # stray '<' in chrome (footer) — malformed-tag tolerance
        html_str = html_str.replace("<footer><p>", "<footer><p>< ", 1)
    html = html_str.encode(encoding, errors="replace")
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": "\n".join(known_nodes),
        "lang": lang,
    }


def generate_batch(seed: int, indices) -> list[dict]:
    return [generate_page(seed, int(i)) for i in indices]


# ----------------------------------------------------------------------
# Spark-side distributed generation
# ----------------------------------------------------------------------

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_dataframe(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Distributed corpus generation: spark.range → mapInPandas, no driver
    materialization — scales to any row count (the 10^12-doc design point
    just raises n_rows/partitions)."""
    import pandas as pd

    if partitions is None:
        partitions = max(1, min(64, n_rows // 250 or 1))

    def gen(batches):
        for pdf in batches:
            rows = generate_batch(seed, pdf["id"].tolist())
            yield pd.DataFrame(rows)

    base = spark.range(0, n_rows, numPartitions=partitions)
    return base.mapInPandas(gen, schema=PAGES_SCHEMA_DDL)


def write_pages(spark, n_rows: int, path: str, seed: int = 42) -> None:
    """Materialize the corpus as a parquet `pages` table. On a real
    cluster this is an Iceberg write partitioned by bucket(16, warc_ts)
    with url-hash bucketing (see mindocr_spark.sources.pages)."""
    pages_dataframe(spark, n_rows, seed).write.mode("overwrite").parquet(path)
