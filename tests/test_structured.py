"""JSON-LD and HTML-table extraction — unit goldens for the carrier
regexes, document-order indexing, malformed-input totality, and the
scan-only plan shape."""


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, bytearray(h.encode())) for u, h in rows],
        "url string, html binary",
    )


def test_jsonld_fields_and_order(spark):
    from mindocr_spark.functions.structured import extract_jsonld

    html = (
        '<head><script>var decoy=1;</script>'
        '<script type="application/ld+json">{"@context":"https://schema.org",'
        '"@type":"Article","headline":"T1","author":"A","datePublished":"2024-02-03"}'
        "</script>"
        '<script type="application/ld+json">{"@type":"Product","name":"P",'
        '"price":42}</script></head>'
    )
    got = extract_jsonld(_pages(spark, [("u", html)])).orderBy(
        "block_idx"
    ).collect()
    assert [(r["block_idx"], r["ld_type"], r["name"]) for r in got] == [
        (0, "Article", "T1"), (1, "Product", "P"),
    ]
    assert got[0]["published"] == "2024-02-03"
    assert got[0]["price"] is None
    assert got[1]["price"] == 42
    assert got[1]["author"] is None


def test_jsonld_malformed_block_yields_null_row(spark):
    from mindocr_spark.functions.structured import extract_jsonld

    html = '<script type="application/ld+json">{"@type":</script>'
    [r] = extract_jsonld(_pages(spark, [("u", html)])).collect()
    assert r["block_idx"] == 0
    assert r["ld_type"] is None and r["name"] is None and r["price"] is None


def test_jsonld_pages_without_blocks_contribute_nothing(spark):
    from mindocr_spark.functions.structured import extract_jsonld

    html = "<html><script>not structured</script></html>"
    assert extract_jsonld(_pages(spark, [("u", html)])).count() == 0


def test_table_cells_indexed_in_document_order(spark):
    from mindocr_spark.functions.structured import extract_tables

    html = (
        "<nav><ul><li>decoy</li></ul></nav>"
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
        "<table><tr><td>x</td></tr></table>"
    )
    got = extract_tables(_pages(spark, [("u", html)])).orderBy(
        "table_idx", "row_idx", "col_idx"
    ).collect()
    assert [
        (r["table_idx"], r["row_idx"], r["col_idx"], r["cell"], r["is_header"])
        for r in got
    ] == [
        (0, 0, 0, "h1", True), (0, 0, 1, "h2", True),
        (0, 1, 0, "a", False), (0, 1, 1, "b", False),
        (1, 0, 0, "x", False),
    ]


def test_table_ragged_rows_keep_their_own_width(spark):
    from mindocr_spark.functions.structured import extract_tables

    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
    got = extract_tables(_pages(spark, [("u", html)])).collect()
    assert {(r["row_idx"], r["col_idx"]) for r in got} == {
        (0, 0), (0, 1), (1, 0),
    }


def test_structured_plans_are_scan_only(spark):
    """Both extractors must stay narrow: regex + posexplode fused into
    the scan, no Exchange anywhere."""
    from mindocr_spark.functions.structured import (
        extract_jsonld, extract_tables,
    )
    from mindocr_spark.sources.pages import (
        pages_from_documents_jsonld, pages_from_documents_tables,
    )

    sf = "/root/testdata/sf0.001"
    for df in (
        extract_jsonld(pages_from_documents_jsonld(spark, sf)),
        extract_tables(pages_from_documents_tables(spark, sf)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_multiline_blocks_and_tables_match(spark):
    """Real-world pretty-printed (multi-line) JSON-LD and tables must
    extract — the patterns carry (?s)."""
    from mindocr_spark.functions.structured import (
        extract_jsonld, extract_tables,
    )

    html = (
        '<script type="application/ld+json">\n{\n  "@type": "Article",\n'
        '  "headline": "Multi"\n}\n</script>'
        "<table>\n<tr>\n<td>a</td>\n<td>b</td>\n</tr>\n</table>"
    )
    [j] = extract_jsonld(_pages(spark, [("u", html)])).collect()
    assert (j["ld_type"], j["name"]) == ("Article", "Multi")
    cells = extract_tables(_pages(spark, [("u", html)])).collect()
    assert sorted(r["cell"] for r in cells) == ["a", "b"]
