"""pdf — a real bytes→blocks parser for the second payload type.

The reference runs its full det→rec pipeline over raw image bytes
end-to-end (reference: tools/infer/text/predict_system.py:77-109;
deploy/py_infer/src/parallel/parallel_pipeline.py:39-67). This module
is the graft's equivalent for PDF-style documents: REAL byte-level
parsing of a pinned PDF 1.4 subset — xref table, object graph
(catalog → pages → page → content stream), /Length-delimited streams,
text-object tokenization (Tm/TL/Tj/T*), literal-string unescaping,
UTF-8 decode — producing the (page, bbox, kind, text) block table that
feeds the existing layout pipeline (NMS → reading order → assembly,
:mod:`mindocr_spark.operators.layout`).

Both the writer (:func:`build_pdf`) and the parser (:func:`parse_pdf`)
are pure-python/stdlib and deterministic; they are independent code
paths (the writer packs bytes, the parser walks the xref and tokenizes
streams), so round-tripping through them is a genuine parse test, and
the assembled text is exactly reconstructable by the SQL oracle.

Pinned geometry (US-Letter points, top-based y in the block table,
PDF-native bottom-based y inside the content streams):

- 2 pages, 2 body columns (x = 36 / 318), body top y = 50;
- header band y < 42, footer band y ≥ 765 (kind classification);
- monospace metrics CHAR_W = 6.0, LEADING = 14.0, hard wrap at
  WRAP = 40 chars/line (line concatenation restores the exact text).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

PAGE_W = 612.0
PAGE_H = 792.0
CHAR_W = 6.0
LEADING = 14.0
WRAP = 40
FONT_SIZE = 12

#: kind classification bands (top-based y)
_HEADER_MAX_Y = 42.0
_FOOTER_MIN_Y = 765.0

PDF_BLOCKS_SCHEMA = (
    "doc_id bigint, page int, x0 double, y0 double, x1 double, y1 double, "
    "kind string, text string"
)

# --------------------------------------------------------------------------
# Writer (deterministic PDF 1.4 subset)
# --------------------------------------------------------------------------

_ESCAPES = [("\\", "\\\\"), ("(", "\\("), (")", "\\)"),
            ("\r", "\\r"), ("\n", "\\n"), ("\t", "\\t")]


def _escape(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def _wrap(s: str) -> list[str]:
    """Hard wrap at WRAP chars — concatenating the lines restores `s`
    exactly (no word wrap, no hyphenation)."""
    if s == "":
        return [""]
    return [s[i:i + WRAP] for i in range(0, len(s), WRAP)]


def _text_block(x0: float, y0_top: float, text: str) -> str:
    """One BT..ET text object at top-based (x0, y0_top): absolute Tm for
    the block origin, T* line advances with TL leading."""
    lines = _wrap(text)
    ops = [
        "BT",
        f"/F1 {FONT_SIZE} Tf",
        f"{LEADING:g} TL",
        f"1 0 0 1 {x0:g} {PAGE_H - y0_top:g} Tm",
    ]
    for i, line in enumerate(lines):
        if i:
            ops.append("T*")
        ops.append(f"({_escape(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops)


def build_pdf(doc_text: str, title: str) -> bytes:
    """documents.text → real PDF 1.4 bytes: 2 pages, body text split
    into quarters (q = len//4, chunks 1-2 on page 1, 3-4 on page 2, the
    4th chunk taking the remainder), header/footer chrome per page, and
    — when the first chunk spans ≥2 lines — a planted watermark block
    strictly inside body column 0 (exercises containment NMS on the
    parsed geometry)."""
    n = len(doc_text)
    q = n // 4
    chunks = [doc_text[:q], doc_text[q:2 * q], doc_text[2 * q:3 * q],
              doc_text[3 * q:]]
    pages = []
    for pg in (1, 2):
        blocks = [
            _text_block(36.0, 10.0, title),                       # header
            _text_block(36.0, 50.0, chunks[0] if pg == 1 else chunks[2]),
            _text_block(318.0, 50.0, chunks[1] if pg == 1 else chunks[3]),
            _text_block(36.0, 770.0, f"page {pg}"),               # footer
        ]
        if pg == 1 and len(chunks[0]) > WRAP:
            # strictly inside body col 0 only when that body block spans
            # ≥2 lines (y1 ≥ 50+28 > watermark's 65 needs care: 1-char
            # block at (37,51) → bbox (37,51,43,65), contained for any
            # body with ≥2 lines and ≥2 chars/line)
            blocks.insert(2, _text_block(37.0, 51.0, "·"))
        pages.append("\n".join(blocks))

    objs: dict[int, bytes] = {}
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"
    for i, content in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} "
            f"{PAGE_H:g}] /Contents {cont_num} 0 R /Resources "
            f"<< /Font << /F1 7 0 R >> >> >>"
        ).encode()
        data = content.encode("utf-8")
        objs[cont_num] = (
            f"<< /Length {len(data)} >>\nstream\n".encode()
            + data + b"\nendstream"
        )
    objs[7] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in sorted(objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


# --------------------------------------------------------------------------
# Parser (real byte-level PDF walk)
# --------------------------------------------------------------------------

_UNESCAPES = {b"\\": b"\\", b"(": b"(", b")": b")",
              b"n": b"\n", b"r": b"\r", b"t": b"\t",
              b"b": b"\b", b"f": b"\f"}

_REF_RE = re.compile(rb"(\d+) 0 R")


def _unescape(raw: bytes) -> bytes:
    if b"\\" not in raw:  # overwhelmingly common: plain line, no walk
        return raw
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _UNESCAPES:
                out += _UNESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \ddd (up to 3 digits)
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
        out += c
        i += 1
    return bytes(out)


def _xref_offsets(payload: bytes) -> tuple[dict[int, int], int]:
    """startxref → xref table → ({obj_num: byte offset}, xref_off).
    20-byte entry rows per the PDF 1.4 spec subset (single section,
    f/n flags)."""
    sx = payload.rfind(b"startxref")
    if sx < 0:
        raise ValueError("no startxref")
    xref_off = int(payload[sx + len(b"startxref"):].split()[0])
    if payload[xref_off:xref_off + 4] != b"xref":
        raise ValueError("xref table not at startxref offset")
    head_end = payload.index(b"\n", payload.index(b"\n", xref_off) + 1)
    start, count = (int(x) for x in
                    payload[payload.index(b"\n", xref_off) + 1:head_end].split())
    offsets = {}
    pos = head_end + 1
    for i in range(count):
        entry = payload[pos:pos + 20]
        off, _gen, flag = entry.split()[:3]
        if flag == b"n":
            offsets[start + i] = int(off)
        pos += 20
    return offsets, xref_off


_OBJ_HEAD_RE = re.compile(rb"(\d+) \d+ obj\s*")
_STREAM_KW_RE = re.compile(rb"\s*stream(\r\n|\n)")


def _obj_at(payload: bytes, off: int) -> tuple[bytes, bytes | None]:
    """Parse the object at an xref offset → (dict_bytes, stream_data).

    STRUCTURAL parse, never a sentinel scan: the object header must sit
    exactly at the offset, the dictionary is consumed by <<…>> nesting,
    and stream data is taken as exactly /Length bytes — so document
    text containing 'endobj', '/Root N 0 R', or any other PDF keyword
    inside a stream can never truncate or hijack the walk (the
    round-trip contract holds for arbitrary content)."""
    m = _OBJ_HEAD_RE.match(payload, off)
    if not m:
        raise ValueError(f"no object header at xref offset {off}")
    p = m.end()
    if payload[p:p + 2] != b"<<":
        raise ValueError("unsupported non-dictionary object")
    depth, i = 0, p
    n = len(payload)
    while i < n:
        two = payload[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                break
        else:
            i += 1
    if depth != 0:
        raise ValueError("unbalanced dictionary")
    dict_bytes = payload[p:i]
    sm = _STREAM_KW_RE.match(payload, i)
    if not sm:
        return dict_bytes, None
    lm = re.search(rb"/Length (\d+)", dict_bytes)
    if not lm:
        raise ValueError("stream without /Length")
    data_start = sm.end()
    return dict_bytes, payload[data_start:data_start + int(lm.group(1))]


#: One alternation matches either a complete literal string or a
#: non-string token; a single C-level scan lexes the whole stream, and
#: operator matching can never fire inside string bytes (document text
#: containing 'ET'/'Tm' etc. is safe).
_TOKEN_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|[^\s(]+", re.S)


def _tokenize(content: bytes):
    """Content-stream lexer: ('str', raw) for literal strings,
    ('op', tok) for everything else."""
    pos = 0
    for m in _TOKEN_RE.finditer(content):
        if content[pos:m.start()].strip():
            # the only byte neither alternation can start on is the "("
            # of an unterminated string literal
            raise ValueError("unterminated string literal")
        tok = m.group(0)
        if tok.startswith(b"("):
            yield ("str", tok)
        else:
            yield ("op", tok)
        pos = m.end()
    if content[pos:].strip():
        raise ValueError("unterminated string literal")


def _parse_content(content: bytes) -> list[tuple[float, float, list[str]]]:
    """BT..ET text objects → [(tm_x, tm_y_pdf, lines)]. Operand-stack
    walk: strings/numbers accumulate until an operator consumes them."""
    blocks, cur, operands = [], None, []
    for kind, tok in _tokenize(content):
        if kind == "str":
            operands.append(tok)
            continue
        if tok == b"BT":
            cur, operands = {"tm": None, "lines": []}, []
        elif tok == b"ET":
            if cur is not None and cur["tm"] is not None:
                blocks.append((cur["tm"][0], cur["tm"][1], cur["lines"]))
            cur, operands = None, []
        elif tok == b"Tm" and cur is not None:
            nums = operands[-6:]
            cur["tm"] = (float(nums[4]), float(nums[5]))
            operands = []
        elif tok == b"Tj" and cur is not None:
            cur["lines"].append(
                _unescape(operands[-1][1:-1]).decode("utf-8")
            )
            operands = []
        elif tok in (b"Tf", b"TL", b"T*", b"Td", b"TD"):
            operands = []
        else:
            operands.append(tok)
    return blocks


def _classify(y0_top: float) -> str:
    if y0_top < _HEADER_MAX_Y:
        return "header"
    if y0_top >= _FOOTER_MIN_Y:
        return "footer"
    return "para"


def parse_pdf(payload: bytes) -> list[dict]:
    """REAL PDF parse: xref walk → page objects in /Kids order →
    content streams → BT..ET text objects → blocks.

    Block bbox from the pinned metrics: x0/y0 from the Tm origin
    (y flipped to top-based), x1 = x0 + CHAR_W·longest line,
    y1 = y0 + LEADING·n_lines; text = concatenation of the block's
    line strings (exact inverse of the writer's hard wrap). kind from
    the header/footer geometry bands.
    Returns [{page, x0, y0, x1, y1, kind, text}, ...].
    """
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    offsets, xref_off = _xref_offsets(payload)
    # /Root lookup restricted to the trailer region (after the xref
    # table) — a whole-payload search could match '/Root N 0 R' inside a
    # document's text stream
    root_m = re.search(rb"/Root (\d+) 0 R", payload[xref_off:])
    if not root_m:
        raise ValueError("trailer without /Root")
    catalog, _ = _obj_at(payload, offsets[int(root_m.group(1))])
    pages_ref = int(re.search(rb"/Pages (\d+) 0 R", catalog).group(1))
    pages_obj, _ = _obj_at(payload, offsets[pages_ref])
    kids = re.search(rb"/Kids \[(.*?)\]", pages_obj, re.S).group(1)
    blocks: list[dict] = []
    for page_idx, kid_m in enumerate(_REF_RE.finditer(kids), start=1):
        page_obj, _ = _obj_at(payload, offsets[int(kid_m.group(1))])
        cont_ref = int(re.search(rb"/Contents (\d+) 0 R", page_obj).group(1))
        _cdict, content = _obj_at(payload, offsets[cont_ref])
        if content is None:
            raise ValueError("page /Contents is not a stream object")
        for tm_x, tm_y, lines in _parse_content(content):
            y0_top = PAGE_H - tm_y
            width = CHAR_W * max((len(ln) for ln in lines), default=0)
            blocks.append(dict(
                page=page_idx,
                x0=tm_x, y0=y0_top,
                x1=tm_x + width,
                y1=y0_top + LEADING * len(lines),
                kind=_classify(y0_top),
                text="".join(lines),
            ))
    return blocks


# --------------------------------------------------------------------------
# Spark stages
# --------------------------------------------------------------------------


def synth_pdf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, pdf binary): the deterministic PDF corpus,
    built distributed (one Arrow batch of documents → PDF bytes per
    row). The writer is the independent twin of the parser."""
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_batch in batches:
            yield pd.DataFrame({
                "doc_id": pdf_batch["doc_id"],
                "pdf": [
                    build_pdf(t, f"Report {i}")
                    for i, t in zip(pdf_batch["doc_id"], pdf_batch["text"])
                ],
            })

    return docs.mapInPandas(gen, schema="doc_id bigint, pdf binary")


def _assemble_blocks(blocks: list[dict], col_split: float = 306.0,
                     sep: str = "\n\n") -> tuple[str, int]:
    """Per-document layout assembly over PARSED blocks: chrome filter →
    containment NMS → newspaper reading order → text join. Semantics
    identical to the relational operators in
    :mod:`mindocr_spark.operators.layout` (suppress_contained /
    reading_order / assemble_document) — proven equal by pytest — but
    runs inside the parse stage when all of a document's blocks come
    from ONE payload row, so the whole bytes→text path is a single
    narrow stage (zero shuffles), exactly like the fused HTML
    extraction. The relational operators remain the path for blocks
    arriving as a distributed table."""
    paras = [b for b in blocks if b["kind"] not in ("header", "footer", "pageno")]

    def contained(a: dict, b: dict) -> bool:
        return (
            a["page"] == b["page"]
            and a["x0"] >= b["x0"] and a["y0"] >= b["y0"]
            and a["x1"] <= b["x1"] and a["y1"] <= b["y1"]
            and (a["x1"] - a["x0"]) * (a["y1"] - a["y0"])
            < (b["x1"] - b["x0"]) * (b["y1"] - b["y0"])
        )

    kept = [a for a in paras if not any(contained(a, b) for b in paras)]
    kept.sort(key=lambda b: (b["page"], b["x0"] >= col_split, b["y0"],
                             b["x0"], b["y1"], b["x1"], b["kind"], b["text"]))
    return sep.join(b["text"] for b in kept), len(kept)


def pdf_extract_fused(df: DataFrame, payload_col: str = "pdf",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, pdf bytes) → (doc_id, doc_text, n_blocks) in ONE narrow
    mapInPandas stage: parse + NMS + reading order + assembly per doc.
    Parse failures yield (doc_id, '', 0, failed=true)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_batch in batches:
            rows = []
            for rid, payload in zip(pdf_batch[id_col], pdf_batch[payload_col]):
                try:
                    text, n = _assemble_blocks(parse_pdf(bytes(payload)))
                    rows.append(dict(doc_id=rid, doc_text=text,
                                     n_blocks=n, failed=False))
                except Exception:
                    rows.append(dict(doc_id=rid, doc_text="", n_blocks=0,
                                     failed=True))
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(
        fn, schema="doc_id bigint, doc_text string, n_blocks bigint, "
                   "failed boolean"
    )


def pdf_blocks(df: DataFrame, payload_col: str = "pdf",
               id_col: str = "doc_id") -> DataFrame:
    """(id, pdf bytes) → one row per parsed layout block — the bytes→
    regions boundary of the det stage (reference:
    tools/infer/text/predict_det.py:80-135 runs bytes→boxes per image).
    Narrow mapInPandas; parse failures flow through as a single
    failed-marker block (kind='failed') rather than killing the task —
    the reference's skip=True contract (reference:
    deploy/py_infer/src/parallel/datatype/process_data.py:7-26)."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf_batch in batches:
            rows = []
            for rid, payload in zip(pdf_batch[id_col], pdf_batch[payload_col]):
                try:
                    for b in parse_pdf(bytes(payload)):
                        rows.append(dict(doc_id=rid, **b))
                except Exception:
                    rows.append(dict(
                        doc_id=rid, page=-1, x0=0.0, y0=0.0, x1=0.0, y1=0.0,
                        kind="failed", text="",
                    ))
            if rows:
                yield pd.DataFrame(rows)[[
                    "doc_id", "page", "x0", "y0", "x1", "y1", "kind", "text"
                ]]

    return df.select(id_col, payload_col).mapInPandas(
        parse, schema=PDF_BLOCKS_SCHEMA
    )
