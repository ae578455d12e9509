"""Multimodal plumbing: Spark-side contract is real, codec is stubbed."""

import hashlib

import pytest


def test_real_decode_unknown_kind_is_guarded():
    """Every claimed kind (image/audio/video) now has a REAL stdlib
    codec; only unknown kinds hit the injectable NotImplementedError
    seam. Garbage video bytes fail the structural parse, not silently."""
    from mindocr_spark.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"xx", "3d-pointcloud")
    with pytest.raises(ValueError):
        real_decode(b"xx", "video")


def test_media_features_with_fake_codec(spark):
    from mindocr_spark.multimodal import (
        extract_media_features,
        fake_decode,
        synth_media_table,
    )

    media = synth_media_table(spark, n=12, seed=7)
    out = {r["id"]: r for r in
           extract_media_features(media, decode=fake_decode).collect()}
    assert len(out) == 12
    assert out[0]["kind"] == "image" and out[1]["kind"] == "audio"
    assert not any(r["failed"] for r in out.values())
    # checksum matches an independent recomputation of the payload spec
    n = (0 * 37 + 7) % 29 + 2
    payload = (hashlib.md5(b"7:0").hexdigest() + "|") * n
    assert out[0]["checksum"] == hashlib.md5(payload.encode()).hexdigest()
    assert out[0]["n_bytes"] == 33 * n
    assert len(out[0]["feature"]) == 8


def test_media_failure_flows_through(spark):
    """A failing codec marks failed=true instead of killing the job —
    the reference's skip=True contract."""
    from mindocr_spark.multimodal import extract_media_features, synth_media_table

    def bad_decode(payload, kind):
        raise ValueError("corrupt")

    media = synth_media_table(spark, n=5, seed=7)
    rows = extract_media_features(media, decode=bad_decode).collect()
    assert len(rows) == 5
    assert all(r["failed"] for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)  # metadata still populated


def test_resize_media_shapes(spark):
    from mindocr_spark.multimodal import fake_decode, resize_media, synth_media_table

    media = synth_media_table(spark, n=9, seed=7)
    rows = resize_media(media, out_h=8, out_w=8, decode=fake_decode).collect()
    assert len(rows) == 9
    assert all(not r["failed"] for r in rows)
    # 8x8 tensors; bytes depend on the decoded dtype per kind
    expect = {"image": 64, "video": 64, "audio": 256}  # uint8 vs float32
    assert all(r["tensor_bytes"] == expect[r["kind"]] for r in rows)


def test_sample_frames_fanout(spark):
    from mindocr_spark.multimodal import fake_decode, sample_frames, synth_media_table

    media = synth_media_table(spark, n=6, seed=7).where("id % 3 = 2")  # videos
    rows = sample_frames(media, every_n=2, decode=fake_decode).collect()
    # fake video decode yields 4 frames → every 2nd = frames 0 and 2
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 2] for v in by_id.values())
    assert all(not r["failed"] for r in rows)
    # deterministic frame checksums
    rows2 = sample_frames(media, every_n=2, decode=fake_decode).collect()
    assert {(r["id"], r["frame_idx"], r["checksum"]) for r in rows} == \
           {(r["id"], r["frame_idx"], r["checksum"]) for r in rows2}


def test_resize_with_real_codec_flags_failed(spark):
    from mindocr_spark.multimodal import resize_media, synth_media_table

    rows = resize_media(synth_media_table(spark, n=4, seed=7)).collect()
    assert all(r["failed"] for r in rows)  # real codec stubbed


def test_size_bucketing_partitions(spark):
    from mindocr_spark.multimodal import size_bucketed, synth_media_table

    media = synth_media_table(spark, n=32, seed=7)
    assert size_bucketed(media, 4).rdd.getNumPartitions() == 4


def test_bmp_roundtrip_exact():
    """Writer and parser are independent (struct-pack vs struct-unpack);
    pixels must survive the BGR/bottom-up/row-padding encoding exactly."""
    import numpy as np
    from mindocr_spark.multimodal import _decode_bmp, encode_bmp

    for h, w in ((3, 3), (5, 3), (4, 7), (1, 1)):
        pix = ((np.arange(h * w * 3) * 31 + 7) % 256).astype(
            np.uint8).reshape(h, w, 3)
        assert np.array_equal(_decode_bmp(encode_bmp(pix)), pix)
    # row padding: w=3 rows are 9 data + 3 pad bytes
    data = encode_bmp(np.zeros((2, 3, 3), np.uint8))
    assert len(data) == 54 + 2 * 12


def test_wav_roundtrip_exact():
    import numpy as np
    from mindocr_spark.multimodal import _decode_wav, encode_wav

    smp = (np.arange(48) * 523 - 12000).astype(np.int16)
    data = encode_wav(smp)
    assert len(data) == 44 + 2 * 48          # canonical PCM header
    assert np.array_equal(_decode_wav(data), smp)


def test_real_decode_dispatch_and_failures():
    import numpy as np
    import pytest
    from mindocr_spark.multimodal import encode_bmp, encode_wav, real_decode

    img = real_decode(encode_bmp(np.full((2, 2, 3), 9, np.uint8)), "image")
    assert img.shape == (2, 2, 3)
    aud = real_decode(encode_wav(np.array([1, -1], np.int16)), "audio")
    assert aud.tolist() == [1, -1]
    with pytest.raises(ValueError):
        real_decode(b"not a bmp", "image")
    vid = real_decode(
        __import__("mindocr_spark.multimodal", fromlist=["encode_avi"])
        .encode_avi(np.full((2, 3, 3, 3), 7, np.uint8)),
        "video",
    )
    assert vid.shape == (2, 3, 3, 3)
    with pytest.raises(ValueError):
        real_decode(b"whatever bytes here", "video")  # structural parse


def test_real_media_features_spark(spark):
    """The full real-codec path distributed: synth BMP/WAV bytes →
    stdlib decode → features; values match the independent numpy
    recomputation of the generation formulas."""
    import numpy as np
    from mindocr_spark.multimodal import (
        extract_media_features,
        real_decode,
        synth_real_media_table,
    )

    rows = {r["id"]: r for r in extract_media_features(
        synth_real_media_table(spark, n=12), decode=real_decode
    ).collect()}
    assert len(rows) == 12 and not any(r["failed"] for r in rows.values())
    for i in range(12):
        if i % 2 == 0:
            side = i % 5 + 3
            y, x, c = np.meshgrid(np.arange(side), np.arange(side),
                                  np.arange(3), indexing="ij")
            flat = ((i * 7 + x * 3 + y * 11 + c * 29) % 256).astype(
                np.float64).ravel()
            assert rows[i]["kind"] == "image"
        else:
            ns = (i % 7 + 2) * 8
            t = np.arange(ns)
            flat = ((((i * 13 + t * 17) % 256) - 128) * 137).astype(np.float64)
            assert rows[i]["kind"] == "audio"
        assert rows[i]["mean_intensity"] == float(np.round(flat.mean(), 6))


def test_avi_roundtrip_exact():
    """Real RIFF/AVI container: encode → structural parse recovers every
    frame bit-exactly across shapes (incl. rows needing DIB padding)."""
    import numpy as np
    from mindocr_spark.multimodal import _decode_avi, encode_avi

    rng = np.random.default_rng(3)
    for n, h, w in [(1, 3, 3), (4, 5, 7), (2, 8, 2), (3, 1, 1)]:
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        out = _decode_avi(encode_avi(fr))
        assert out.shape == fr.shape
        assert (out == fr).all()


def test_avi_rejects_hostile_framing():
    import numpy as np
    import pytest
    from mindocr_spark.multimodal import _decode_avi, encode_avi

    rng = np.random.default_rng(5)
    good = encode_avi(rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="RIFF AVI"):
        _decode_avi(b"RIFF" + good[4:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError):
        _decode_avi(good[:20])          # no strf reachable
    with pytest.raises(ValueError):
        _decode_avi(good[:-10])         # truncation must fail the walk
    # frame chunk truncated mid-pixel-data
    cut = good[: good.index(b"00db") + 8 + 5]
    with pytest.raises(ValueError):
        _decode_avi(cut)


def test_avi_huge_dims_rejected_before_allocation():
    """A tiny hostile payload whose strf declares w=h=100000 must fail
    the per-frame length check BEFORE the output buffer is sized from
    those attacker-controlled fields — otherwise ~70 bytes of input
    force a ~30 GB allocation (executor OOM-kill, not a caught
    ValueError)."""
    import struct

    import numpy as np
    import pytest
    from mindocr_spark.multimodal import _decode_avi, encode_avi

    rng = np.random.default_rng(7)
    good = encode_avi(rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8))
    bad = bytearray(good)
    i = good.index(b"strf") + 8  # BITMAPINFOHEADER: biSize, biWidth, biHeight
    bad[i + 4:i + 12] = struct.pack("<ii", 100_000, 100_000)
    with pytest.raises(ValueError, match="truncated"):
        _decode_avi(bytes(bad))


def test_sample_frames_real_avi(spark):
    """The video fan-out runs on REAL container bytes end-to-end: one
    output row per sampled frame, checksums = md5 of the formula's
    pixel bytes."""
    import hashlib
    import numpy as np
    from mindocr_spark.multimodal import sample_frames, synth_real_video_table

    rows = sample_frames(synth_real_video_table(spark, 12), every_n=2).collect()
    assert not any(r["failed"] for r in rows)
    by_key = {(r["id"], r["frame_idx"]): r for r in rows}
    for i in range(12):
        nf, side = i % 4 + 2, i % 5 + 3
        for fi in range(0, nf, 2):
            f, y, x, c = np.meshgrid(
                [fi], np.arange(side), np.arange(side), np.arange(3),
                indexing="ij",
            )
            pix = ((i * 7 + f * 53 + x * 3 + y * 11 + c * 29) % 256
                   ).astype(np.uint8)[0]
            r = by_key[(i, fi)]
            assert r["frame_bytes"] == side * side * 3
            assert r["checksum"] == hashlib.md5(pix.tobytes()).hexdigest()
    assert len(rows) == sum(len(range(0, i % 4 + 2, 2)) for i in range(12))


class TestPngCodec:
    """Real compressed PNG path: full-filter roundtrip, CRC and
    structure validation, magic dispatch, failure flow."""

    def test_roundtrip_exercises_all_filters(self):
        import numpy as np

        from mindocr_spark.multimodal import _decode_png, encode_png

        rng = np.random.default_rng(11)
        for h, w in [(1, 1), (5, 3), (7, 7), (6, 2)]:
            pix = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            assert np.array_equal(_decode_png(encode_png(pix)), pix)

    def test_crc_corruption_raises(self):
        import numpy as np
        import pytest as _pytest

        from mindocr_spark.multimodal import _decode_png, encode_png

        b = bytearray(encode_png(
            np.zeros((4, 4, 3), np.uint8)))
        b[20] ^= 0xFF
        with _pytest.raises(ValueError, match="CRC"):
            _decode_png(bytes(b))

    def test_unsupported_and_malformed_raise(self):
        import struct
        import zlib

        import pytest as _pytest

        from mindocr_spark.multimodal import _decode_png

        with _pytest.raises(ValueError, match="not a PNG"):
            _decode_png(b"BM notapng")

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body)))

        # grayscale (color type 0) is outside the honest subset
        gray = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR",
                        struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)))
        with _pytest.raises(ValueError, match="truecolor"):
            _decode_png(gray)
        # valid header, IDAT inflates to the wrong scanline size
        bad = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"\x00abc"))
               + chunk(b"IEND", b""))
        with _pytest.raises(ValueError, match="size mismatch"):
            _decode_png(bad)

    def test_real_decode_magic_dispatch(self):
        import numpy as np

        from mindocr_spark.multimodal import (
            encode_bmp,
            encode_png,
            real_decode,
        )

        pix = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
        assert np.array_equal(real_decode(encode_png(pix), "image"), pix)
        assert np.array_equal(real_decode(encode_bmp(pix), "image"), pix)

    def test_corrupt_png_flows_as_failed_row(self, spark):
        import numpy as np

        from mindocr_spark.multimodal import (
            encode_png,
            extract_media_features,
            real_decode,
        )

        good = encode_png(np.zeros((3, 3, 3), np.uint8))
        bad = good[:30]  # truncated mid-chunk
        df = spark.createDataFrame(
            [(1, bytearray(good),
              dict(kind="image", width=3, height=3, n_frames=1,
                   sample_rate=0, codec="png")),
             (2, bytearray(bad),
              dict(kind="image", width=3, height=3, n_frames=1,
                   sample_rate=0, codec="png"))],
            "id bigint, payload binary, media_meta map<string,string>",
        )
        out = {r["id"]: r for r in
               extract_media_features(df, decode=real_decode).collect()}
        assert out[1]["failed"] is False
        assert out[1]["mean_intensity"] == 0.0
        assert out[2]["failed"] is True  # row survives, flagged


class TestJPEGCodec:
    def test_zigzag_is_the_spec_permutation(self):
        from mindocr_spark.multimodal import _JZZ

        # ITU-T T.81 Figure A.6, first entries (row*8+col indices)
        assert list(_JZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert sorted(_JZZ) == list(range(64))

    def test_constant_even_tiles_roundtrip_exactly(self):
        import numpy as np

        from mindocr_spark.multimodal import _decode_jpeg, encode_jpeg

        rng = np.random.RandomState(3)
        tiles = (rng.randint(0, 128, (2, 5)) * 2).astype(np.uint8)
        img = np.kron(tiles, np.ones((8, 8), np.uint8))
        assert np.array_equal(_decode_jpeg(encode_jpeg(img)), img)

    def test_lossy_roundtrip_bounded_and_cropped(self):
        import numpy as np

        from mindocr_spark.multimodal import _decode_jpeg, encode_jpeg

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
        out = _decode_jpeg(encode_jpeg(img))
        assert out.shape == (13, 21)
        # error bounded by the quant-table step budget
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) < 60
        # smooth content decodes near-losslessly
        grad = np.tile(np.arange(32, dtype=np.uint8) * 4, (16, 1))
        back = _decode_jpeg(encode_jpeg(grad))
        assert int(np.abs(back.astype(int) - grad.astype(int)).max()) <= 2

    def test_byte_stuffing_survives(self):
        import numpy as np

        from mindocr_spark.multimodal import _decode_jpeg, encode_jpeg

        # scan many seeds so at least one entropy stream contains a
        # stuffed 0xFF byte — then the roundtrip proves unstuffing
        hit = False
        for seed in range(20):
            rng = np.random.RandomState(seed)
            img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
            enc = encode_jpeg(img)
            body = enc[enc.index(b"\xff\xda") + 2:-2]
            if b"\xff\x00" in body:
                hit = True
            _decode_jpeg(enc)  # must decode regardless
        assert hit

    def test_six_byte_com_comment_is_not_a_crop(self):
        """A genuine COM segment whose body happens to be 6 bytes must
        NOT be interpreted as the private crop convention — only the
        magic-tagged APP9 segment carries crop dims."""
        import struct

        import numpy as np

        from mindocr_spark.multimodal import _decode_jpeg, encode_jpeg

        img = (np.arange(13 * 21, dtype=np.uint8) % 199).reshape(13, 21)
        enc = encode_jpeg(img)
        # splice a 6-byte COM comment right after SOI; if it were read
        # as dims it would claim a 26738x27749 crop and garble decode
        com = struct.pack(">HH", 0xFFFE, 8) + b"hi!\x68\x6c\x6c"
        spliced = enc[:2] + com + enc[2:]
        out = _decode_jpeg(spliced)
        assert out.shape == (13, 21)
        assert np.array_equal(out, _decode_jpeg(enc))
        # an APP9 without the magic is also skipped, not a crop
        app9 = struct.pack(">HH", 0xFFE9, 10) + b"XXXX" + b"\x00\x01\x00\x01"
        assert _decode_jpeg(enc[:2] + app9 + enc[2:]).shape == (13, 21)

    def test_rejects_non_baseline_and_garbage(self):
        import numpy as np
        import pytest as _pytest

        from mindocr_spark.multimodal import _decode_jpeg, encode_jpeg

        with _pytest.raises(ValueError):
            _decode_jpeg(b"\x89PNG")
        enc = bytearray(encode_jpeg(
            np.zeros((8, 8), np.uint8)))
        sof = bytes(enc).index(b"\xff\xc0")
        enc[sof + 1] = 0xC2   # claim progressive
        with _pytest.raises(ValueError):
            _decode_jpeg(bytes(enc))


class TestWebDataset:
    def test_roundtrip_and_deterministic_shards(self, spark):
        from mindocr_spark.multimodal import (
            export_webdataset,
            ingest_webdataset,
        )

        media = spark.createDataFrame(
            [(i, bytes([i % 256] * (i + 1)), None) for i in range(10)],
            "id bigint, payload binary, media_meta string",
        )
        shards = export_webdataset(media, shard_size=4).collect()
        by_id = {r["shard_id"]: r for r in shards}
        assert sorted(by_id) == [0, 1, 2]
        assert [by_id[s]["n_members"] for s in (0, 1, 2)] == [4, 4, 2]
        # pinned tar metadata -> byte-identical on re-export
        again = {r["shard_id"]: r["tar_bytes"] for r in
                 export_webdataset(media, shard_size=4).collect()}
        assert all(bytes(by_id[s]["tar_bytes"]) == bytes(again[s])
                   for s in by_id)
        back = {r["id"]: bytes(r["payload"]) for r in ingest_webdataset(
            export_webdataset(media, shard_size=4)).collect()}
        assert back == {i: bytes([i % 256] * (i + 1)) for i in range(10)}

    def test_member_names_are_sorted_ids(self, spark):
        import io
        import tarfile

        from mindocr_spark.multimodal import export_webdataset

        media = spark.createDataFrame(
            [(7, b"a", None), (3, b"b", None), (5, b"c", None)],
            "id bigint, payload binary, media_meta string",
        )
        [row] = export_webdataset(media, shard_size=100).collect()
        with tarfile.open(fileobj=io.BytesIO(bytes(row["tar_bytes"]))) as tf:
            names = [m.name for m in tf.getmembers()]
        assert names == ["00000003.jpg", "00000005.jpg", "00000007.jpg"]
