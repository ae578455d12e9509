"""WET derived-format: record round-trip, distributed write/ingest
parity, corrupt-segment failure rows, bit-reproducibility."""

import glob
import os


def test_conversion_record_roundtrip():
    from mindocr_spark.sources.wet import (
        format_conversion_record, parse_wet,
    )

    recs = (
        format_conversion_record("https://a/x", 1704067205, "héllo\nwörld")
        + format_conversion_record("https://a/y", 0, "")
    )
    got = parse_wet(recs)
    assert [(r["url"], r["ts_sec"], r["text"]) for r in got] == [
        ("https://a/x", 1704067205, "héllo\nwörld"),
        ("https://a/y", 0, ""),
    ]


def test_parse_wet_skips_warcinfo_and_rejects_corruption():
    import pytest
    from mindocr_spark.sources.wet import (
        _wetinfo, format_conversion_record, parse_wet,
    )

    payload = _wetinfo("f.warc.wet") + format_conversion_record(
        "https://a/x", 5, "t"
    )
    assert [r["url"] for r in parse_wet(payload)] == ["https://a/x"]
    with pytest.raises(ValueError):
        parse_wet(payload[:-2])  # truncated terminator
    with pytest.raises(ValueError):
        parse_wet(b"GARBAGE" + payload)


def test_wet_write_ingest_parity_and_reproducibility(spark, tmp_path):
    from mindocr_spark.sources.wet import read_wet, write_wet_dir

    docs = spark.createDataFrame(
        [(f"https://w.example/{i}", i, f"text {i} é") for i in range(40)],
        "url string, ts bigint, text string",
    ).selectExpr("url", "timestamp_seconds(ts) AS warc_ts", "text")

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    assert write_wet_dir(docs, d1, n_files=4) == 40
    assert write_wet_dir(docs, d2, n_files=4) == 40
    for f1 in sorted(glob.glob(f"{d1}/*.warc.wet")):
        f2 = os.path.join(d2, os.path.basename(f1))
        assert open(f1, "rb").read() == open(f2, "rb").read()  # bit-repro

    back = read_wet(spark, d1).collect()
    assert {(r["url"], r["text"]) for r in back} == {
        (f"https://w.example/{i}", f"text {i} é") for i in range(40)
    }


def test_wet_corrupt_file_yields_failure_row_not_abort(spark, tmp_path):
    from mindocr_spark.sources.wet import read_wet, write_wet_dir

    docs = spark.createDataFrame(
        [("https://w.example/ok", 1, "fine")],
        "url string, ts bigint, text string",
    ).selectExpr("url", "timestamp_seconds(ts) AS warc_ts", "text")
    write_wet_dir(docs, str(tmp_path), n_files=1)
    bad = tmp_path / "part-zzzzz.warc.wet"
    bad.write_bytes(b"WARC/1.0\r\nContent-Length: -5\r\n\r\n")

    rows = read_wet(spark, str(tmp_path)).collect()
    by_ok = {r["url"]: r for r in rows}
    assert by_ok["https://w.example/ok"]["text"] == "fine"
    [fail] = [r for r in rows if r["text"] is None]
    assert fail["url"].endswith("part-zzzzz.warc.wet")


def test_wat_record_roundtrip_and_corruption():
    import json
    import pytest
    from mindocr_spark.sources.wat import (
        format_metadata_record, parse_wat,
    )

    body = json.dumps({"url": "u/x", "title": "T", "digest": "d",
                       "length": 5, "n_anchors": 2}, sort_keys=True).encode()
    recs = format_metadata_record("u/x", 1704067201, body)
    [e] = parse_wat(recs)
    assert (e["url"], e["title"], e["n_anchors"], e["ts_sec"]) == (
        "u/x", "T", 2, 1704067201)
    with pytest.raises(ValueError):
        parse_wat(recs[:-2])


def test_wat_write_ingest_parity(spark, tmp_path):
    from mindocr_spark.sources.wat import read_wat, write_wat_dir

    pages = spark.createDataFrame(
        [(f"https://w.example/{i}", i,
          bytearray(f'<title>T{i}</title><a href="/x">x</a>'.encode()))
         for i in range(20)],
        "url string, ts bigint, html binary",
    ).selectExpr("url", "timestamp_seconds(ts) AS warc_ts", "html")
    assert write_wat_dir(pages, str(tmp_path), n_files=3) == 20
    got = {r["url"]: r for r in read_wat(spark, str(tmp_path)).collect()}
    assert len(got) == 20
    r = got["https://w.example/7"]
    assert r["title"] == "T7"
    assert r["n_anchors"] == 1
    import hashlib

    assert r["digest"] == hashlib.md5(
        '<title>T7</title><a href="/x">x</a>'.encode()
    ).hexdigest()
