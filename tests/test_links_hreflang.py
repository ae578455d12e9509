"""hreflang edition clustering and edit-distance verification —
edge-case goldens the sf-corpus oracles can't exercise: one-sided
declarations, duplicate-language conflicts, x-default targets,
blocking caps, and the exact integer similarity boundary."""


def _pages(spark, rows):
    return spark.createDataFrame(
        [(f"https://docs.example/d/{d}", bytearray(h.encode()), d)
         for d, h in rows],
        "url string, html binary, doc_id long",
    )


def _alt(lang, d):
    return (f'<link rel="alternate" hreflang="{lang}"'
            f' href="https://docs.example/d/{d}">')


# ----------------------------------------------------------------------
# hreflang_clusters
# ----------------------------------------------------------------------

def test_hreflang_ok_cluster(spark):
    from mindocr_spark.functions.links import hreflang_clusters

    block = _alt("en", 10) + _alt("fr", 11) + _alt("x-default", 10)
    rows = [(10, block), (11, block)]
    got = hreflang_clusters(_pages(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["cluster_id"], r["n_members"], r["n_declaring"],
            r["n_langs"], r["status"]) == (10, 2, 2, 2, "ok")
    assert r["default_url"] == "https://docs.example/d/10"


def test_hreflang_broken_reciprocity(spark):
    from mindocr_spark.functions.links import hreflang_clusters

    block = _alt("en", 20) + _alt("fr", 21) + _alt("x-default", 20)
    # member 21 never declares: one-sided cluster
    rows = [(20, block), (21, "")]
    r = hreflang_clusters(_pages(spark, rows)).collect()[0]
    assert (r["n_members"], r["n_declaring"], r["status"]) == (
        2, 1, "broken_reciprocity")


def test_hreflang_lang_conflict_and_precedence(spark):
    from mindocr_spark.functions.links import hreflang_clusters

    # both members claim "en" — conflict; all members declare
    block = _alt("en", 30) + _alt("en", 31) + _alt("x-default", 30)
    rows = [(30, block), (31, block)]
    r = hreflang_clusters(_pages(spark, rows)).collect()[0]
    assert (r["n_langs"], r["status"]) == (1, "lang_conflict")
    # broken wins over conflict when both hold
    rows = [(30, block), (31, "")]
    r = hreflang_clusters(_pages(spark, rows)).collect()[0]
    assert r["status"] == "broken_reciprocity"


def test_hreflang_silent_cluster_absent(spark):
    from mindocr_spark.functions.links import hreflang_clusters

    # a page with no declarations contributes nothing at all
    got = hreflang_clusters(_pages(spark, [(40, "<p>plain</p>")]))
    assert got.count() == 0


# ----------------------------------------------------------------------
# editdist_verify
# ----------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_editdist_boundary_is_integer_exact(spark):
    from mindocr_spark.functions.dedup import editdist_verify

    # maxlen 10, lev 1: 10*(10-1) == 9*10 — boundary ACCEPTS
    rows = [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "abcdefgXYZ")]
    got = {
        (r["doc_a"], r["doc_b"]): (r["lev"], r["is_dup"])
        for r in editdist_verify(
            _docs(spark, rows), prefix_chars=5
        ).collect()
    }
    assert got[(1, 2)] == (1, True)    # exactly at 0.9
    assert got[(1, 3)] == (3, False)   # below
    assert got[(2, 3)] == (3, False)


def test_editdist_block_cap_drops_hot_prefix(spark):
    from mindocr_spark.functions.dedup import editdist_verify

    rows = [(i, "shared prefix " + "x" * i) for i in range(1, 5)]
    out = editdist_verify(_docs(spark, rows), prefix_chars=10,
                          max_block=2)
    assert out.count() == 0  # 4-doc block > cap: routed away, no pairs


def test_editdist_no_cross_block_pairs(spark):
    from mindocr_spark.functions.dedup import editdist_verify

    rows = [(1, "aaaaaaaaaa111"), (2, "bbbbbbbbbb111")]
    assert editdist_verify(
        _docs(spark, rows), prefix_chars=10
    ).count() == 0
