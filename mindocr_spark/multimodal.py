"""multimodal — opaque binary payload columns with typed metadata.

The reference's whole input path is "bytes → decode → fixed-shape
features" (reference: mindocr/data/transforms/general_transforms.py:25-64
``DecodeImage``; LMDB byte payloads, mindocr/data/rec_lmdb_dataset.py:169-181).
Here the same plumbing is generalized to any media payload: an opaque
``payload: binary`` column plus a ``media_meta`` struct, processed by
Arrow-batched ``mapInPandas`` stages whose *Spark-side* contract (schema,
batch shape, partitioning, failure semantics) is real and tested, while
the codec itself is stubbed:

- real decoders (PIL/cv2/ffmpeg) are NOT in this container — the
  ``decode=`` hook raises :class:`NotImplementedError` unless a
  deterministic fake is injected (tests inject :func:`fake_decode`);
- everything around the codec — skew-aware size bucketing, per-batch
  vectorized feature extraction, `skip`-style failure flagging — is the
  production code path.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = (
    "media_meta struct<kind:string,width:int,height:int,n_frames:int,"
    "sample_rate:int,codec:string>"
)

FEATURES_SCHEMA = (
    "id bigint, kind string, n_bytes bigint, checksum string, "
    "mean_intensity double, feature array<float>, failed boolean"
)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BI_RGB BMP bytes
    (bottom-up rows, 4-byte padded). Independent twin of the decoder —
    round-tripping through real file bytes is a genuine codec test."""
    import struct

    h, w, _ = pixels.shape
    row = ((3 * w + 3) // 4) * 4
    data_size = row * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                      2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):          # bottom-up
        line = pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body += line + b"\x00" * (row - len(line))
    return header + dib + bytes(body)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → PCM WAV bytes (stdlib `wave`, 44-byte
    canonical header)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def _decode_bmp(data: bytes) -> np.ndarray:
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    bpp, = struct.unpack("<H", data[28:30])
    comp, = struct.unpack("<I", data[30:34])
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    top_down, h = h < 0, abs(h)
    row = ((3 * w + 3) // 4) * 4
    img = np.zeros((h, w, 3), np.uint8)
    for r in range(h):
        src = off + r * row
        line = np.frombuffer(data[src:src + 3 * w], np.uint8).reshape(w, 3)
        img[r if top_down else h - 1 - r] = line[:, ::-1]  # BGR → RGB
    return img


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor (RFC 2083 §6.6), vectorized; ties resolve
    left → up → upper-left, the spec order."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 8-bit/color truecolor PNG bytes — a REAL
    compressed codec (stdlib zlib DEFLATE), with the scanline filter
    type ROTATING per row (y % 5: None/Sub/Up/Average/Paeth) so any
    decoder of these payloads must implement the full RFC 2083 filter
    suite, not just the trivial one."""
    import struct
    import zlib

    h, w, _ = pixels.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, 3), np.int32)
    zero = np.zeros((1, 3), np.int32)
    for y in range(h):
        row = pixels[y].astype(np.int32)
        left = np.vstack([zero, row[:-1]])
        ul = np.vstack([zero, prev[:-1]])
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        else:
            filt = row - _paeth(left, prev, ul)
        raw.append(ft)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _decode_png(data: bytes) -> np.ndarray:
    """STRUCTURAL PNG parse → (h, w, 3) uint8 RGB: chunk walk with CRC
    verification, zlib inflate, and full five-filter scanline
    reconstruction (RFC 2083 §6) — the honest-subset policy of the
    other stdlib codecs (8-bit truecolor, non-interlaced; other color
    types need external libs and raise)."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, dims = 8, b"", None
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, bitd, ct, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if (bitd, ct, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit truecolor non-interlaced PNG supported")
            dims = (h, w)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if dims is None:
        raise ValueError("PNG without IHDR")
    h, w = dims
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    if len(raw) != h * stride:
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, w, 3), np.uint8)
    prev = np.zeros((w, 3), np.int32)
    for y in range(h):
        ft = raw[y * stride]
        line = np.frombuffer(
            raw, np.uint8, w * 3, y * stride + 1
        ).astype(np.int32).reshape(w, 3)
        if ft == 0:
            row = line
        elif ft == 2:
            row = (line + prev) % 256
        elif ft in (1, 3, 4):
            row = np.zeros((w, 3), np.int32)
            for x in range(w):
                left = row[x - 1] if x else np.zeros(3, np.int32)
                up = prev[x]
                ul = prev[x - 1] if x else np.zeros(3, np.int32)
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                row[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = row
        prev = row
    return out


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB → RIFF AVI bytes with uncompressed 24-bit
    DIB ('00db') frames — the canonical hdrl(avih, strl(strh,strf)) +
    movi + idx1 layout, rows bottom-up BGR padded to 4 bytes (the same
    DIB pixel framing as :func:`encode_bmp`). Independent twin of the
    decoder so round-tripping through real container bytes is a genuine
    codec test."""
    import struct

    n, h, w, _ = frames.shape
    row = ((3 * w + 3) // 4) * 4
    frame_size = row * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_size, -1 & 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_frames = []
    for f in range(n):
        body = bytearray()
        for y in range(h - 1, -1, -1):                # bottom-up
            line = frames[f, y, :, ::-1].tobytes()    # RGB → BGR
            body += line + b"\x00" * (row - len(line))
        movi_frames.append(chunk(b"00db", bytes(body)))
    movi = lst(b"movi", b"".join(movi_frames))

    idx, off = [], 4  # offsets are relative to the 'movi' fourcc
    for fc in movi_frames:
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_size))
        off += len(fc)
    idx1 = chunk(b"idx1", b"".join(idx))

    riff = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _walk_riff(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [start, end) — the word-aligned RIFF walk. Framing is validated the
    same way the WARC walker is: sizes must stay in bounds and the
    cursor must strictly advance (hostile container hardening)."""
    import struct

    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if size > end - body:
            raise ValueError(f"RIFF chunk at {pos} overruns its parent")
        yield fourcc, body, size
        new_pos = body + size + (size & 1)
        if new_pos <= pos:
            raise ValueError(f"RIFF walk did not advance at {pos}")
        pos = new_pos


def _decode_avi(data: bytes) -> np.ndarray:
    """STRUCTURAL RIFF/AVI parse (chunk walk, never sentinel scans) →
    (n_frames, h, w, 3) uint8 RGB. Only uncompressed 24-bit DIB
    ('00db'/'00dc' with biCompression=0) video is supported — the same
    honest-subset policy as the BMP/WAV codecs."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    w = h = bpp = comp = None
    frames: list[bytes] = []

    def scan_list(start: int, end: int, depth: int = 0) -> None:
        nonlocal w, h, bpp, comp
        if depth > 16:  # real AVIs nest ~3 deep; crafted input must not
            raise ValueError("RIFF LIST nesting too deep")
        for fourcc, body, size in _walk_riff(data, start, end):
            if fourcc == b"LIST":
                scan_list(body + 4, body + size, depth + 1)
            elif fourcc == b"strf" and w is None:
                if size < 40:
                    raise ValueError("strf too small for BITMAPINFOHEADER")
                _, w, h, _, bpp, comp = struct.unpack(
                    "<IiiHHI", data[body:body + 20]
                )
            elif fourcc in (b"00db", b"00dc"):
                frames.append(data[body:body + size])

    # clamp to the ACTUAL byte count: a truncated file whose RIFF size
    # field still declares the full length must fail the chunk walk,
    # not silently slice short payloads
    scan_list(12, min(8 + struct.unpack("<I", data[4:8])[0], len(data)))
    if w is None:
        raise ValueError("AVI without a strf stream format")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit DIB AVI supported")
    top_down, h = h < 0, abs(h)
    row = ((3 * w + 3) // 4) * 4
    # validate every frame BEFORE sizing the output buffer: its shape
    # comes from attacker-controlled strf fields, and a tiny hostile
    # payload declaring w=h=100000 would otherwise force a multi-GB
    # allocation (executor OOM) before any per-frame check runs. Once
    # all frames carry row*h real bytes, the allocation is bounded by
    # the payload size itself.
    for f, fr in enumerate(frames):
        if len(fr) < row * h:
            raise ValueError(f"frame {f} truncated")
    out = np.zeros((len(frames), h, w, 3), np.uint8)
    for f, fr in enumerate(frames):
        for r in range(h):
            line = np.frombuffer(
                fr[r * row:r * row + 3 * w], np.uint8
            ).reshape(w, 3)
            out[f, r if top_down else h - 1 - r] = line[:, ::-1]  # BGR→RGB
    return out


def _jpeg_zigzag() -> np.ndarray:
    """The spec zigzag permutation, GENERATED rather than transcribed
    (ITU-T T.81 Figure A.6): anti-diagonal s walks with u increasing on
    odd diagonals — (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),…"""
    idx = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for u in (rng if s % 2 else reversed(rng)):
            idx.append(u * 8 + (s - u))
    return np.array(idx)


_JZZ = _jpeg_zigzag()

#: Orthonormal 8-point DCT-II basis: A[u,x] = c(u)/2·cos((2x+1)uπ/16);
#: forward F = A·f·Aᵀ, inverse f = Aᵀ·F·A. A constant block has ONLY a
#: DC coefficient (= 8·value), which is what makes the exact-roundtrip
#: corpus below possible.
_JA = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])

#: Luma quantization table (natural order): DC step 16 — 8·v' for even
#: v' is a multiple of 16, so constant even-valued blocks survive
#: quantization EXACTLY — with a mild JPEG-like AC ramp.
_JQ = (16 + 2 * (np.arange(64).reshape(8, 8) // 8
                 + np.arange(64).reshape(8, 8) % 8)).astype(np.int64)
_JQ[0, 0] = 16

#: Huffman tables, canonical and deliberately SIMPLE (the tables live
#: in the file's DHT segments — any valid prefix code is spec-legal, so
#: nothing depends on transcribing Annex K): DC categories 0..11 as
#: twelve 4-bit codes; all 162 AC symbols as 8-bit codes.
_JDC_BITS = [0, 0, 0, 12] + [0] * 12
_JDC_VALS = list(range(12))
_JAC_BITS = [0] * 7 + [162] + [0] * 8
_JAC_VALS = (
    [0x00]
    + [r * 16 + s for r in range(16) for s in range(1, 11)]
    + [0xF0]
)
_JAC_VALS.sort()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(BITS, HUFFVAL) → {symbol: (code, length)} per T.81 Annex C."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:       # entropy-data byte stuffing
                self.out.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _jmag(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (category, appended bits)."""
    s = int(abs(v)).bit_length()
    return (s, v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 GRAYSCALE → baseline sequential JFIF bytes
    (SOF0, one component, our canonical Huffman tables in DHT, the
    `_JQ` quant table in DQT). Edge-replicated to 8-multiples; the
    decoder crops back via the SOF dimensions. Independent twin of
    `_decode_jpeg` — round-tripping REAL entropy-coded bytes is the
    codec test, and constant even-valued 8×8 tiles round-trip
    EXACTLY (DC-only blocks, DC step 16)."""
    import struct

    h, w = pixels.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.pad(pixels.astype(np.float64) - 128.0,
                 ((0, ph - h), (0, pw - w)), mode="edge")
    dc_codes = _canonical_codes(_JDC_BITS, _JDC_VALS)
    ac_codes = _canonical_codes(_JAC_BITS, _JAC_VALS)
    bw = _BitWriter()
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            f = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            coef = np.rint((_JA @ f @ _JA.T) / _JQ).astype(np.int64)
            zz = coef.ravel()[_JZZ]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s, extra = _jmag(diff)
            bw.put(*dc_codes[s])
            if s:
                bw.put(extra, s)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac_codes[0xF0])     # ZRL
                    run -= 16
                s, extra = _jmag(v)
                bw.put(*ac_codes[run * 16 + s])
                bw.put(extra, s)
                run = 0
            if last < 63:
                bw.put(*ac_codes[0x00])         # EOB
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(
        int(v) for v in _JQ.ravel()[_JZZ]))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, ph, pw, 1)
              + struct.pack(">BBB", 1, 0x11, 0))
    # SOF records the PADDED dims; the true crop rides in an APP9
    # segment tagged with a magic prefix — unambiguous, so a genuine
    # JPEG whose 6-byte COM comment happens to parse as dims can never
    # trigger the crop (plain COM segments are ignored by the decoder)
    com = seg(0xFFE9, b"MOCR" + struct.pack(">HH", h, w))
    dht = (seg(0xFFC4, b"\x00" + bytes(_JDC_BITS)
               + bytes(_JDC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(_JAC_BITS)
                 + bytes(_JAC_VALS)))
    sos = seg(0xFFDA, b"\x01" + struct.pack(">BB", 1, 0x00)
              + b"\x00\x3f\x00")
    return (b"\xff\xd8" + com + dqt + sof + dht + sos
            + entropy + b"\xff\xd9")


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if not self.n:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if (self.pos >= len(self.data)
                        or self.data[self.pos] != 0x00):
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1      # drop the stuffed 0x00
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential grayscale JPEG decoder (the subset
    `encode_jpeg` emits, validated not assumed): segment walk, DQT /
    DHT tables FROM THE FILE (canonical reconstruction per Annex C),
    entropy decode with byte-unstuffing, dequantize, inverse zigzag,
    separable IDCT, level shift, crop to the true dimensions (magic-
    tagged APP9 segment; SOF carries the padded grid; plain COM /
    untagged APPn segments are skipped). Progressive scans, chroma
    components, and restart markers raise — a documented subset, the
    BMP/PNG/WAV/AVI codec discipline."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    ph = pw = h = w = 0
    entropy_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + ln]
        if marker == 0xDB:
            while body:
                tid = body[0] & 0x0F
                if body[0] >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.zeros(64, np.int64)
                flat[_JZZ] = np.frombuffer(body[1:65], np.uint8)
                qt[tid] = flat.reshape(8, 8)
                body = body[65:]
        elif marker == 0xC0:
            _, ph, pw, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only 1-component (grayscale) JPEG")
            if h == 0:
                h, w = ph, pw
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential SOF0 supported")
        elif marker == 0xC4:
            while body:
                cls, tid = body[0] >> 4, body[0] & 0x0F
                bits = list(body[1:17])
                n = sum(bits)
                vals = list(body[17:17 + n])
                codes = _canonical_codes(bits, vals)
                huff[(cls, tid)] = {
                    (c, l): sym for sym, (c, l) in codes.items()}
                body = body[17 + n:]
        elif marker == 0xE9 and ln == 10 and body[:4] == b"MOCR":
            # the writer's magic-tagged crop convention; untagged APPn
            # and COM segments fall through and are skipped untouched
            h, w = struct.unpack(">HH", body[4:8])
        elif marker == 0xDA:
            entropy_start = pos + ln
            break
        pos += ln
    if entropy_start is None or not qt or (0, 0) not in huff:
        raise ValueError("missing SOS/DQT/DHT")
    br = _BitReader(data[entropy_start:data.rindex(b"\xff\xd9")])
    q = qt[0]
    dc_t, ac_t = huff[(0, 0)], huff[(1, 0)]
    img = np.zeros((ph, pw), np.float64)
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            zz = np.zeros(64, np.int64)
            s = _huff_decode(br, dc_t)
            diff = 0
            if s:
                m = br.bits(s)
                diff = m if m >= (1 << (s - 1)) else m - (1 << s) + 1
            pred += diff
            zz[0] = pred
            k = 1
            while k < 64:
                sym = _huff_decode(br, ac_t)
                if sym == 0x00:         # EOB
                    break
                if sym == 0xF0:         # ZRL
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 0x0F
                m = br.bits(size)
                v = m if m >= (1 << (size - 1)) else m - (1 << size) + 1
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = v
                k += 1
            coef = np.zeros(64, np.int64)
            coef[_JZZ] = zz
            f = _JA.T @ (coef.reshape(8, 8) * q) @ _JA
            img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = f
    out = np.clip(np.rint(img + 128.0), 0, 255).astype(np.uint8)
    return out[:h, :w]


def _decode_wav(data: bytes) -> np.ndarray:
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        frames = wf.readframes(wf.getnframes())
    arr = np.frombuffer(frames, dtype="<i2")
    if wf.getnchannels() > 1:
        arr = arr.reshape(-1, wf.getnchannels())
    return arr


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """The codec boundary, REAL for every kind this engine claims:
    BMP (24-bit BI_RGB → (h, w, 3) uint8 RGB) and PNG (8-bit truecolor,
    zlib DEFLATE + full five-filter reconstruction, magic-dispatched)
    for images, WAV (16-bit PCM → int16 samples) for audio, RIFF/AVI
    (uncompressed 24-bit DIB frames → (n, h, w, 3) uint8 RGB) for
    video — exercising the exact batch/schema plumbing with genuine
    byte parsing (the reference's DecodeImage does cv2.imdecode,
    reference: mindocr/data/transforms/general_transforms.py:25-64).
    Other compressed codecs (JPEG/H.264/…) still need external libs —
    inject a decoder through the ``decode=`` hook on a cluster that
    has them."""
    if kind == "image":
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(payload)
        if payload[:2] == b"\xff\xd8":
            return _decode_jpeg(payload)
        return _decode_bmp(payload)
    if kind == "audio":
        return _decode_wav(payload)
    if kind == "video":
        return _decode_avi(payload)
    raise NotImplementedError(
        f"no stdlib codec for kind={kind!r}; wire in ffmpeg/cv2 here "
        "or inject decode=fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → uint8 tensor whose shape
    depends on `kind` — exercises the exact batch/shape plumbing the real
    codec would."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if kind == "image":
        side = max(1, int(len(arr) ** 0.5))
        return arr[: side * side].reshape(side, side)
    if kind == "audio":
        return arr.astype(np.float32) / 255.0
    if kind == "video":
        frame = max(1, len(arr) // 4)
        return arr[: frame * 4].reshape(4, frame)
    return arr


def extract_media_features(
    df: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = real_decode,
    feat_dim: int = 8,
) -> DataFrame:
    """(id, payload, media_meta) → per-item features.

    One narrow ``mapInPandas``: decode (codec hook) → vectorized numpy
    feature summary (histogram-ish projection to feat_dim) per item in
    the Arrow batch. Failures flag ``failed=true`` and flow through (the
    reference's skip=True contract,
    reference: deploy/py_infer/src/parallel/datatype/process_data.py:7-26).
    """
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload, meta in zip(pdf["id"], pdf["payload"], pdf["media_meta"]):
                kind = (meta or {}).get("kind", "unknown")
                b = bytes(payload or b"")
                row = dict(
                    id=rid, kind=kind, n_bytes=len(b),
                    checksum=hashlib.md5(b).hexdigest(),
                    mean_intensity=0.0,
                    feature=[0.0] * feat_dim, failed=False,
                )
                try:
                    tensor = decode(b, kind)
                    flat = np.asarray(tensor, dtype=np.float64).ravel()
                    if flat.size:
                        row["mean_intensity"] = float(np.round(flat.mean(), 6))
                        hist, _ = np.histogram(
                            flat, bins=feat_dim,
                            range=(0.0, max(float(flat.max()), 1.0)),
                        )
                        row["feature"] = (
                            hist / max(flat.size, 1)
                        ).astype(np.float32).tolist()
                except NotImplementedError:
                    row["failed"] = True
                except Exception:
                    row["failed"] = True
                out.append(row)
            if out:
                yield pd.DataFrame(out)

    return df.select("id", "payload", "media_meta").mapInPandas(
        fn, schema=FEATURES_SCHEMA
    )


RESIZE_SCHEMA = (
    "id bigint, kind string, out_h int, out_w int, tensor_bytes bigint, "
    "failed boolean"
)

FRAMES_SCHEMA = (
    "id bigint, frame_idx int, frame_bytes bigint, checksum string, "
    "failed boolean"
)


def resize_media(
    df: DataFrame,
    out_h: int = 32,
    out_w: int = 32,
    decode: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """Decode → resize to (out_h, out_w) — the `DetResize` analog for
    media payloads (reference: mindocr/data/transforms/det_transforms.py:
    322-497). Resize itself is nearest-neighbor index math in numpy
    (deterministic, no interpolation library); the codec is the
    injectable stub."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload, meta in zip(pdf["id"], pdf["payload"], pdf["media_meta"]):
                kind = (meta or {}).get("kind", "unknown")
                row = dict(id=rid, kind=kind, out_h=out_h, out_w=out_w,
                           tensor_bytes=0, failed=False)
                try:
                    t = decode(bytes(payload or b""), kind)
                    t = np.atleast_2d(np.asarray(t))
                    ys = (np.arange(out_h) * t.shape[0]) // out_h
                    xs = (np.arange(out_w) * t.shape[1]) // out_w
                    resized = t[np.ix_(ys, xs)]
                    row["tensor_bytes"] = int(resized.nbytes)
                except Exception:
                    row["failed"] = True
                out.append(row)
            if out:
                yield pd.DataFrame(out)

    return df.select("id", "payload", "media_meta").mapInPandas(
        fn, schema=RESIZE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    decode: Callable[[bytes, str], np.ndarray] = real_decode,
) -> DataFrame:
    """Frame sampling for video payloads: decode → take every Nth frame
    → one OUTPUT ROW PER FRAME (the det→rec region fan-out shape applied
    to media; reference: deploy/py_infer/src/parallel/module/processor/
    rec_pre_node.py:51-72 fans one doc into many messages)."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload, meta in zip(pdf["id"], pdf["payload"], pdf["media_meta"]):
                kind = (meta or {}).get("kind", "unknown")
                try:
                    t = np.atleast_2d(np.asarray(decode(bytes(payload or b""), kind)))
                    for fi in range(0, t.shape[0], every_n):
                        frame = t[fi]
                        out.append(dict(
                            id=rid, frame_idx=fi,
                            frame_bytes=int(frame.nbytes),
                            checksum=hashlib.md5(frame.tobytes()).hexdigest(),
                            failed=False,
                        ))
                except Exception:
                    out.append(dict(id=rid, frame_idx=-1, frame_bytes=0,
                                    checksum="", failed=True))
            if out:
                yield pd.DataFrame(out)

    return df.select("id", "payload", "media_meta").mapInPandas(
        fn, schema=FRAMES_SCHEMA
    )


def size_bucketed(df: DataFrame, target_partitions: int) -> DataFrame:
    """Range-partition by payload size before the decode stage — the
    gear-batching analog (reference:
    deploy/py_infer/src/data_process/utils/gear_utils.py:11-35): co-batches
    similar-sized media so a 4K video doesn't stall a thumbnail batch."""
    return df.repartitionByRange(target_partitions, F.length("payload"))


def synth_real_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-format media corpus: even ids → 24-bit BMP
    images (side = id%5+3, pixel[y,x,c] = (id·7 + x·3 + y·11 + c·29)
    mod 256), odd ids → 16-bit PCM WAVs ((id%7+2)·8 samples,
    sample[t] = ((id·13 + t·17) mod 256 − 128)·137). The generation
    formulas are integer arithmetic a SQL oracle reproduces exactly, so
    decoded statistics (mean intensity, byte sizes) are cross-engine
    checkable while the payloads themselves are real file bytes."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    side = i % 5 + 3
                    y, x, c = np.meshgrid(
                        np.arange(side), np.arange(side), np.arange(3),
                        indexing="ij",
                    )
                    pix = ((i * 7 + x * 3 + y * 11 + c * 29) % 256).astype(
                        np.uint8
                    )
                    payload, kind = encode_bmp(pix), "image"
                    meta = dict(kind=kind, width=side, height=side,
                                n_frames=1, sample_rate=0, codec="bmp")
                else:
                    ns = (i % 7 + 2) * 8
                    t = np.arange(ns)
                    smp = (((i * 13 + t * 17) % 256) - 128) * 137
                    payload, kind = encode_wav(smp.astype(np.int16)), "audio"
                    meta = dict(kind=kind, width=0, height=0, n_frames=ns,
                                sample_rate=16000, codec="pcm16")
                rows.append(dict(id=i, payload=payload, media_meta=meta))
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )


def synth_real_png_table(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-PNG corpus: side = id%5+3 (sides ≥ 5 exercise
    all five scanline filters via encode_png's per-row rotation),
    pixel[y,x,c] = (id·5 + x·7 + y·13 + c·31) mod 256. The payloads are
    genuinely DEFLATE-compressed; the pixel formula is integer
    arithmetic a SQL oracle reproduces exactly, so a correct decoded
    mean is only reachable through a working inflate + un-filter."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                side = i % 5 + 3
                y, x, c = np.meshgrid(
                    np.arange(side), np.arange(side), np.arange(3),
                    indexing="ij",
                )
                pix = ((i * 5 + x * 7 + y * 13 + c * 31) % 256).astype(
                    np.uint8
                )
                rows.append(dict(
                    id=i, payload=encode_png(pix),
                    media_meta=dict(kind="image", width=side, height=side,
                                    n_frames=1, sample_rate=0,
                                    codec="png"),
                ))
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )


def synth_real_jpeg_table(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-JPEG corpus: side = 8·(id%3+1), the image is
    8×8 tiles of CONSTANT EVEN values tile(ty,tx) = ((id·11 + ty·23 +
    tx·37) % 128)·2. The payloads go through genuine baseline entropy
    coding (DCT → quant → Huffman), but constant even-valued tiles are
    DC-only blocks that survive the DC-16 quantizer exactly — so the
    decoded image equals the tile formula bit-for-bit and the SQL
    oracle can state the decoded mean from pure arithmetic. A correct
    mean is only reachable through a working Huffman + dequant + IDCT
    chain."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                tiles_per_side = i % 3 + 1
                side = 8 * tiles_per_side
                ty, tx = np.meshgrid(
                    np.arange(tiles_per_side), np.arange(tiles_per_side),
                    indexing="ij",
                )
                tiles = (((i * 11 + ty * 23 + tx * 37) % 128) * 2
                         ).astype(np.uint8)
                pix = np.kron(tiles, np.ones((8, 8), np.uint8))
                rows.append(dict(
                    id=i, payload=encode_jpeg(pix),
                    media_meta=dict(kind="image", width=side, height=side,
                                    n_frames=1, sample_rate=0,
                                    codec="jpeg"),
                ))
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )


def synth_real_video_table(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-AVI video corpus: n_frames = id%4+2, square
    side = id%5+3, pixel[f,y,x,c] = (id·7 + f·53 + x·3 + y·11 + c·29)
    mod 256 — integer formulas a SQL oracle reproduces exactly (down to
    per-frame md5 over the raw RGB bytes), while the payloads are real
    RIFF/AVI container bytes."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                nf, side = i % 4 + 2, i % 5 + 3
                f, y, x, c = np.meshgrid(
                    np.arange(nf), np.arange(side), np.arange(side),
                    np.arange(3), indexing="ij",
                )
                pix = ((i * 7 + f * 53 + x * 3 + y * 11 + c * 29) % 256
                       ).astype(np.uint8)
                rows.append(dict(
                    id=i, payload=encode_avi(pix),
                    media_meta=dict(kind="video", width=side, height=side,
                                    n_frames=nf, sample_rate=0, codec="avi"),
                ))
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(
        gen, schema=f"id bigint, payload binary, {MEDIA_META_DDL}"
    )


def synth_media_table(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media corpus for plumbing tests: payload bytes
    derive from (seed, id) via JVM-side expressions (no Python)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    base = spark.range(n).select(
        F.col("id"),
        kinds.getItem(F.pmod(F.col("id"), F.lit(3)).cast("int")).alias("kind"),
    )
    payload = F.repeat(
        F.concat(F.md5(F.concat_ws(":", F.lit(seed), F.col("id"))), F.lit("|")),
        (F.pmod(F.col("id") * 37 + seed, F.lit(29)) + 2).cast("int"),
    ).cast("binary")
    return base.select(
        "id",
        payload.alias("payload"),
        F.struct(
            F.col("kind"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(4).alias("n_frames"), F.lit(16000).alias("sample_rate"),
            F.lit("fake").alias("codec"),
        ).alias("media_meta"),
    )


WDS_SHARD_SCHEMA = "shard_id bigint, n_members int, tar_bytes binary"
WDS_MEMBER_SCHEMA = "id bigint, payload binary"


def export_webdataset(
    media: DataFrame, shard_size: int = 16, ext: str = "jpg"
) -> DataFrame:
    """(id, payload, …) → WebDataset-style tar shards
    (shard_id, n_members, tar_bytes): members named ``{id:08d}.{ext}``
    in ascending id order, all tar metadata pinned (mtime 0, uid/gid 0,
    mode 0644, USTAR format) so shard bytes are a pure function of the
    data — the reproducible-artifact discipline every release pipeline
    wants. This is the storage format multimodal training loaders
    stream (tar sequential reads beat per-file object-store GETs by
    orders of magnitude at 10^9-sample scale).

    100 TB shape: ONE shuffle on the shard key (id div shard_size — a
    uniform integer key, no skew), tar assembly per shard in an Arrow
    batch; shard size bounds executor memory (members × payload), and
    the output relation is ready for a binary sink or a foreachBatch
    object-store upload. Production writes stream shards straight to
    storage; the relation form here keeps the round trip testable.

    Reference analog: `save_det_res`-style sharded result export
    (reference: mindocr/utils/evaluator.py result sink), lifted to the
    tar-shard layout."""
    import io
    import tarfile

    import pandas as pd

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                body = bytes(payload)
                info = tarfile.TarInfo(name=f"{int(rid):08d}.{ext}")
                info.size = len(body)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(body))
        return pd.DataFrame([{
            "shard_id": int(pdf["shard_id"].iloc[0]),
            "n_members": len(pdf),
            "tar_bytes": buf.getvalue(),
        }])

    shards = media.select(
        "id", "payload",
        F.expr(f"id div {int(shard_size)}").alias("shard_id"),
    )
    return shards.groupBy("shard_id").applyInPandas(
        build, schema=WDS_SHARD_SCHEMA
    )


def ingest_webdataset(shards: DataFrame) -> DataFrame:
    """tar shards → (id, payload): the loader side of the WebDataset
    round trip, stdlib tarfile over in-memory shard bytes, member ids
    parsed back from the ``{id:08d}.{ext}`` naming. One narrow
    mapInPandas — shards stream through executors without ever landing
    on the driver."""
    import io
    import tarfile

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["tar_bytes"]:
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(blob)), mode="r"
                ) as tf:
                    for m in tf.getmembers():
                        rows.append(dict(
                            id=int(m.name.split(".")[0]),
                            payload=tf.extractfile(m).read(),
                        ))
            if rows:
                yield pd.DataFrame(rows)

    return shards.select("tar_bytes").mapInPandas(
        fn, schema=WDS_MEMBER_SCHEMA
    )
