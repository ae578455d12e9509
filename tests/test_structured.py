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


class TestExtractOutline:
    def _run(self, spark, html):
        from mindocr_spark.functions.structured import extract_outline

        pages = spark.createDataFrame(
            [("u", html)], "url string, html string"
        )
        return [
            (r["heading_idx"], r["level"], r["text"], r["parent_idx"])
            for r in extract_outline(pages)
            .orderBy("heading_idx")
            .collect()
        ]

    def test_nesting_and_skip_levels(self, spark):
        html = (
            "<html><body><h1>A</h1><h2>B</h2><h4>C</h4>"
            "<h2>D</h2><h3>E</h3><h1>F</h1><h3>G</h3></body></html>"
        )
        assert self._run(spark, html) == [
            (0, 1, "A", None),
            (1, 2, "B", 0),
            (2, 4, "C", 1),     # skip-level: parent is the h2
            (3, 2, "D", 0),
            (4, 3, "E", 3),     # binds to the NEAREST h2, not the first
            (5, 1, "F", None),
            (6, 3, "G", 5),     # resets after the new h1
        ]

    def test_root_h2_and_multiline(self, spark):
        html = "<h2>Pre\nface</h2><h1>T</h1><h2>S</h2>"
        assert self._run(spark, html) == [
            (0, 2, "Pre\nface", None),  # no preceding smaller level
            (1, 1, "T", None),
            (2, 2, "S", 1),
        ]

    def test_headingless_page_contributes_nothing(self, spark):
        assert self._run(spark, "<html><body><p>x</p></body></html>") == []

    def test_single_shuffle_plan(self, spark):
        from mindocr_spark.functions.structured import extract_outline

        pages = spark.createDataFrame(
            [("u", "<h1>A</h1>")], "url string, html string"
        )
        plan = (
            extract_outline(pages)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one Window node, one Exchange, no Python
        assert plan.count("Window") == 1
        assert plan.count("Exchange") == 1
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_template_signature_clusters_by_structure_not_text(spark):
    """Same markup + different text -> same template_id; one extra
    element -> a different template_id; closing tags / comments /
    doctype never contribute to the signature."""
    from mindocr_spark.functions.structured import template_signature_cols

    pages = spark.createDataFrame(
        [
            ("u1", "<!DOCTYPE html><html><body><p>alpha</p></body></html>"),
            ("u2", "<!DOCTYPE html><html><body><p>beta text</p></body></html>"),
            ("u3", "<html><body><p>gamma</p><div>x</div></body></html>"),
        ],
        "url string, html string",
    )
    out = {r["url"]: r for r in template_signature_cols(pages).collect()}
    assert out["u1"]["template_id"] == out["u2"]["template_id"]
    assert out["u1"]["template_id"] != out["u3"]["template_id"]
    assert out["u1"]["template_pages"] == 2
    assert out["u3"]["template_pages"] == 1
    assert out["u1"]["n_tags"] == 3  # html, body, p
    assert out["u3"]["n_tags"] == 4


def test_template_signature_whitespace_split_attributes(spark):
    """Attributes broken onto their own line (real-world formatting)
    must not change the structural signature."""
    from mindocr_spark.functions.structured import template_signature_cols

    pages = spark.createDataFrame(
        [
            ("u1", '<html><body><div class="x"><p>t</p></div></body></html>'),
            ("u2", '<html><body><div\n  class="x"><p>u</p></div></body></html>'),
            ("u3", '<html><body><div\tclass="x"><p>v</p></div></body></html>'),
        ],
        "url string, html string",
    )
    out = {r["url"]: r for r in template_signature_cols(pages).collect()}
    assert out["u1"]["template_id"] == out["u2"]["template_id"]
    assert out["u1"]["template_id"] == out["u3"]["template_id"]
    assert out["u1"]["template_pages"] == 3


# ----------------------------------------------------------------------
# funnel_stages (strict temporal ordering)
# ----------------------------------------------------------------------

def test_funnel_requires_order(spark, tmp_path):
    import datetime as dt
    import __spark_entry__ as E

    base = dt.datetime(2024, 1, 1)
    def ts(m):
        return base + dt.timedelta(minutes=m)
    rows = [
        # u1: full ordered funnel
        (1, ts(0), 1, "view", 0.0, "{}"),
        (2, ts(1), 1, "click", 0.0, "{}"),
        (3, ts(2), 1, "purchase", 0.0, "{}"),
        # u2: click BEFORE first view -> stage stops at 1
        (4, ts(0), 2, "click", 0.0, "{}"),
        (5, ts(1), 2, "view", 0.0, "{}"),
        (6, ts(2), 2, "purchase", 0.0, "{}"),  # purchase needs click>view
        # u3: never views
        (7, ts(0), 3, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r["funnel_stage"]
           for r in E.q_funnel_stages(spark, str(tmp_path)).collect()}
    assert got == {1: 3, 2: 1, 3: 0}
