"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
small typed header; decode / feature-extract / resize / frame-sample run
as Arrow-batched mapInPandas operators. Six REAL formats decode with
the stdlib alone and exercise the full pipeline end to end: BMP
(uncompressed 8/24-bpp → grayscale, resize re-encodes a readable BMP),
PNG (zlib inflate + all five scanline filters; gray/RGB/palette/alpha
color types; resize re-encodes a readable grayscale PNG), GIF
(full variable-width LZW + interlace + local color tables; resize
re-encodes a readable GIF via literal-code LZW), baseline JPEG
(SOF0 huffman + dequant + IDCT for grayscale/4:4:4 with arbitrary
tables; the encoder emits Annex-K-quantized grayscale with a flat
prefix code, so resize round-trips; progressive/subsampled raise),
netpbm PGM/PPM,
PCM WAV (via the `wave` module), and AVI video (real RIFF container
parse; uncompressed 8-bpp DIB frame streams decode, and MOTION-JPEG
('MJPG') streams decode through the real JPEG codec — the engine both
writes and reads a genuinely compressed video format; frame_sample
emits each kept frame as a readable BMP so the image operators compose
downstream). Everything beyond those is STUBBED (this container has no
PIL/ffmpeg — compressed video/image codecs genuinely need them): real
libraries plug in behind the `_HAVE_PIL` import-try, and the
deterministic fake container format ("FAKEIMG1/FAKEAUD1/FAKEVID1")
keeps the Spark-side plumbing — binary schema, Arrow batch shape,
partition-local decode, metadata structs — testable for the
still-unsupported codecs.

Fake container layout (big-endian):
    magic   8 bytes   b"FAKEIMG1" | b"FAKEAUD1" | b"FAKEVID1"
    w, h    2 x int32 (images/video; sample_rate+n_samples for audio)
    frames  int32     (video only)
    payload w*h bytes (deterministic from the id)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # real decoder, if ever available
    import PIL.Image  # noqa: F401  # pragma: no cover

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_A, _B, _M = 2654435761, 1013904223, 2**31

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FAKEIMG1", b"FAKEAUD1", b"FAKEVID1"


# --- real pure-stdlib codecs: BMP (8-bpp palette / 24-bpp) and PCM WAV ---
# These are the first REAL formats behind the magic sniff; everything
# else still raises NotImplementedError until PIL/ffmpeg exist.


def _decode_bmp(raw: bytes):
    """Uncompressed BMP → (h, w) uint8 grayscale ndarray. Supports
    8-bpp palettized and 24-bpp BGR (integer ITU-R 601 luminance);
    bottom-up and top-down row orders; 4-byte row padding."""
    import numpy as np

    if raw[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    w, h = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} unsupported "
            "(only uncompressed 8/24-bpp)"
        )
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    px = np.frombuffer(raw, np.uint8, row_bytes * h, data_off).reshape(
        h, row_bytes
    )
    if not top_down:
        px = px[::-1]
    if bpp == 8:
        # palette: BGRX quads between the DIB header and the pixel data;
        # biClrUsed (DIB offset 32 within the header, absolute 46) sizes
        # it — 0 means the full 2^bpp entries. A short palette is legal,
        # so never assume 256 (reading past it would swallow pixel data).
        n_pal = 256
        if hdr_size >= 36:  # header carries biClrUsed
            n_pal = struct.unpack_from("<I", raw, 46)[0] or 256
        if data_off < 14 + hdr_size + n_pal * 4:
            raise ValueError(
                f"BMP pixel data offset {data_off} overlaps the "
                f"{n_pal}-entry palette"
            )
        pal = np.frombuffer(
            raw, np.uint8, n_pal * 4, 14 + hdr_size
        ).reshape(n_pal, 4)
        lum = (
            (pal[:, 2].astype(np.int64) * 299
             + pal[:, 1].astype(np.int64) * 587
             + pal[:, 0].astype(np.int64) * 114) // 1000
        ).astype(np.uint8)
        idx = px[:, :w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP pixel index beyond palette size")
        return lum[idx]
    bgr = px[:, : w * 3].reshape(h, w, 3).astype(np.int64)
    return (
        (bgr[:, :, 2] * 299 + bgr[:, :, 1] * 587 + bgr[:, :, 0] * 114) // 1000
    ).astype(np.uint8)


def encode_bmp_gray(arr) -> bytes:
    """(h, w) uint8 → 8-bpp grayscale-palette BMP (bottom-up), so
    resized output remains a readable real-format image."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    row_bytes = (w + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = a
    payload = rows[::-1].tobytes()
    pal = bytes(b for i in range(256) for b in (i, i, i, 0))
    data_off = 14 + 40 + len(pal)
    return (
        b"BM"
        + struct.pack("<IHHI", data_off + len(payload), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(payload),
                      2835, 2835, 256, 0)
        + pal
        + payload
    )


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(raw: bytes):
    """Non-interlaced 8-bit PNG → (h, w) uint8 grayscale ndarray, pure
    stdlib (zlib inflate + the five scanline filters). Color types:
    gray(0), RGB(2) via integer ITU-R 601 luminance, palette(3),
    gray+alpha(4), RGBA(6). 16-bit depth / interlacing raise
    NotImplementedError."""
    import zlib

    import numpy as np

    if raw[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(raw):
        ln = int.from_bytes(raw[pos:pos + 4], "big")
        typ = raw[pos + 4:pos + 8]
        data = raw[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + payload + crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG depth={depth} interlace={interlace} unsupported "
            "(8-bit non-interlaced only)"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"PNG color type {color} invalid")
    stride = w * channels
    dec = zlib.decompress(b"".join(idat))
    if len(dec) < (stride + 1) * h:
        raise ValueError("PNG scanline data truncated")
    img = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = dec[y * (stride + 1)]
        line = np.frombuffer(
            dec, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: + recon[x-bpp]; per-lane cumsum mod 256
            cur = np.cumsum(line.reshape(w, channels), axis=0) & 0xFF
            cur = cur.reshape(stride)
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential in x
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                if f == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {f} invalid")
        img[y] = cur.astype(np.uint8)
        prev = cur
    if color == 0:
        return img
    if color == 4:  # gray + alpha: luminance channel
        return img.reshape(h, w, 2)[:, :, 0].copy()
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3).astype(np.int64)
        lum = ((pal[:, 0] * 299 + pal[:, 1] * 587 + pal[:, 2] * 114)
               // 1000).astype(np.uint8)
        idx = img.reshape(h, w)
        if int(idx.max(initial=0)) >= len(lum):
            raise ValueError("PNG palette index out of range")
        return lum[idx]
    rgb = img.reshape(h, w, channels).astype(np.int64)  # 2 or 6
    return (
        (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    ).astype(np.uint8)


def encode_png_gray(arr) -> bytes:
    """(h, w) uint8 → 8-bit grayscale PNG (filter 0 scanlines), so
    resized output stays a readable real-format image."""
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    scan = np.zeros((h, w + 1), np.uint8)
    scan[:, 1:] = a
    payload = zlib.compress(scan.tobytes(), 6)

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            len(data).to_bytes(4, "big")
            + body
            + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", payload)
        + chunk(b"IEND", b"")
    )


# --- real pure-stdlib baseline JPEG (SOF0) codec ---
# Decoder: any baseline grayscale/YCbCr 4:4:4 stream with arbitrary
# DHT/DQT tables (returns the Y plane — JPEG luma IS the 601-weighted
# luminance the other decoders produce). Encoder: single-component
# grayscale baseline with the Annex-K luminance quant table and a
# trivially-valid flat Huffman table (all 256 symbols at 8 bits — a
# complete prefix code, so any conforming decoder reads it; optimal
# coding is irrelevant here, byte-identical round-trips are).

_JPEG_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _zigzag():
    """The 64-entry zigzag index order, generated (not transcribed):
    anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()
        order.extend(i * 8 + j for i, j in diag)
    return order


_ZZ = _zigzag()


def _dct_matrix():
    import numpy as np

    t = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            t[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16)
    t *= 0.5
    t[0, :] *= 1 / np.sqrt(2)
    return t


class _JpegBits:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker."""

    def __init__(self, raw: bytes, off: int):
        self.raw, self.off, self.cur, self.nbits = raw, off, 0, 0

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.raw[self.off]
            if b == 0xFF:
                nxt = self.raw[self.off + 1]
                if nxt == 0x00:
                    self.off += 2
                else:
                    raise EOFError("marker in entropy stream")
            else:
                self.off += 1
            self.cur, self.nbits = b, 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(bits: "_JpegBits", table: dict) -> int:
    length, code = 0, 0
    while length < 17:
        code = (code << 1) | bits.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, n: int) -> int:
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_jpeg(raw: bytes):
    """Baseline (SOF0) JPEG → (h, w) uint8 luma plane. Components must
    all have 1x1 sampling (4:4:4 or grayscale); progressive (SOF2),
    subsampled, arithmetic-coded, and DRI/restart streams raise
    NotImplementedError — real libraries plug in behind _HAVE_PIL."""
    import numpy as np

    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, list] = {}
    huff: dict[tuple, dict] = {}
    frame = None
    off = 2
    while off < len(raw):
        if raw[off] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while raw[off] == 0xFF:
            off += 1
        marker = raw[off]
        off += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(raw[off:off + 2], "big")
        seg = raw[off + 2:off + seglen]
        off += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec:
                    vals = [int.from_bytes(seg[p + 2 * i:p + 2 * i + 2],
                                           "big") for i in range(64)]
                    p += 128
                else:
                    vals = list(seg[p:p + 64])
                    p += 64
                qt[tid] = vals
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1:p + 17])
                p += 17
                tbl, code = {}, 0
                for ln in range(1, 17):
                    for _ in range(counts[ln - 1]):
                        tbl[(ln, code)] = seg[p]
                        p += 1
                        code += 1
                    code <<= 1
                huff[(cls, tid)] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], int.from_bytes(seg[1:3], "big"), \
                int.from_bytes(seg[3:5], "big"), seg[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG needs PIL — not in this container"
                    )
                comps.append((cid, tq))
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG (progressive/arithmetic) needs PIL"
            )
        elif marker == 0xDD:  # DRI
            if int.from_bytes(seg[:2], "big"):
                raise NotImplementedError("JPEG restart intervals")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            h, w, comps = frame
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                tq = dict(comps)[cs]
                scan.append((cs, tt >> 4, tt & 0xF, tq))
            t = _dct_matrix()
            bx, by = (w + 7) // 8, (h + 7) // 8
            planes = {cs: np.zeros((by * 8, bx * 8), np.float64)
                      for cs, _, _, _ in scan}
            pred = {cs: 0 for cs, _, _, _ in scan}
            bits = _JpegBits(raw, off)
            for m in range(bx * by):
                yb, xb = divmod(m, bx)
                for cs, td, ta, tq in scan:
                    zz = np.zeros(64)
                    s = _huff_decode(bits, huff[(0, td)])
                    pred[cs] += _extend(bits.bits(s), s)
                    zz[0] = pred[cs]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(bits, huff[(1, ta)])
                        r, sz = rs >> 4, rs & 0xF
                        if sz == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        zz[k] = _extend(bits.bits(sz), sz)
                        k += 1
                    blk = np.zeros(64)
                    blk[_ZZ] = zz * np.asarray(qt[tq], np.float64)
                    px = t.T @ blk.reshape(8, 8) @ t + 128.0
                    planes[cs][yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] = px
            y = planes[scan[0][0]][:h, :w]
            return np.clip(np.rint(y), 0, 255).astype(np.uint8)
        # APPn/COM and everything else: skipped
    raise ValueError("JPEG had no scan data")


def encode_jpeg_gray(arr) -> bytes:
    """(h, w) uint8 → baseline grayscale JPEG (Annex-K luminance quant
    table, flat 8-bit Huffman tables — valid, deliberately simple), so
    resized output stays a readable real-format image."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((by * 8, bx * 8), np.float64)
    padded[:h, :w] = a
    padded[h:, :w] = a[h - 1:h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1:w]
    t = _dct_matrix()
    # _JPEG_QT is Annex-K in natural row-major order; the DQT segment
    # below writes it zigzag-reordered per the spec, so encoder and
    # decoder both quantize with the true Annex-K weighting.
    qnat = np.asarray(_JPEG_QT, np.float64).reshape(8, 8)

    out = bytearray()
    cur, nbits = 0, 0

    def put(val: int, n: int) -> None:
        nonlocal cur, nbits
        for i in range(n - 1, -1, -1):
            cur = (cur << 1) | ((val >> i) & 1)
            nbits += 1
            if nbits == 8:
                out.append(cur)
                if cur == 0xFF:
                    out.append(0x00)
                cur, nbits = 0, 0

    pred = 0
    for ybk in range(by):
        for xbk in range(bx):
            blk = padded[ybk * 8:ybk * 8 + 8, xbk * 8:xbk * 8 + 8] - 128.0
            coef = t @ blk @ t.T
            zz = np.rint(coef / qnat).astype(np.int64).reshape(64)[_ZZ]
            dc = int(zz[0]) - pred
            pred = int(zz[0])
            mag = abs(dc)
            sz = mag.bit_length()
            put(sz, 8)  # flat 8-bit code for DC size symbol
            if sz:
                put(dc if dc > 0 else dc + (1 << sz) - 1, sz)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    put(0xF0, 8)  # ZRL
                    run -= 16
                sz = abs(v).bit_length()
                put((run << 4) | sz, 8)
                put(v if v > 0 else v + (1 << sz) - 1, sz)
                run = 0
            if run:
                put(0x00, 8)  # EOB
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)  # 1-pad final byte

    def seg(marker: int, body: bytes) -> bytes:
        return b"\xff" + bytes([marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0]) + bytes(_JPEG_QT[i] for i in _ZZ))
    sof = seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
              + bytes([1, 1, 0x11, 0]))
    # 255 codes of length 8 + one of length 9: a valid prefix code
    # over all 256 symbols with one unused 9-bit leaf
    flat9 = bytes([0] * 7 + [255, 1] + [0] * 7) + bytes(range(256))
    dht = seg(0xC4, bytes([0x00]) + flat9) + seg(0xC4, bytes([0x10]) + flat9)
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bytes(out) + b"\xff\xd9")


GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _decode_pnm(raw: bytes):
    """Netpbm binary P5 (PGM, grayscale) / P6 (PPM, RGB → integer
    ITU-R 601 luminance) → (h, w) uint8 ndarray. Comments ('#' to end
    of line) are honored anywhere in the header; maxval must fit a
    byte."""
    import numpy as np

    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    toks: list[int] = []
    i, n = 2, len(raw)
    while len(toks) < 3 and i < n:
        c = raw[i:i + 1]
        if c == b"#":
            while i < n and raw[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not raw[j:j + 1].isspace():
                j += 1
            toks.append(int(raw[i:j]))
            i = j
    i += 1  # exactly one whitespace byte separates maxval from pixels
    w, h, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit PNM unsupported")
    if raw[:2] == b"P5":
        return np.frombuffer(raw, np.uint8, w * h, i).reshape(h, w).copy()
    rgb = (
        np.frombuffer(raw, np.uint8, w * h * 3, i)
        .reshape(h, w, 3)
        .astype(np.int64)
    )
    return (
        (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
    ).astype(np.uint8)


def encode_pgm_gray(arr) -> bytes:
    """(h, w) uint8 → binary PGM (P5) — the simplest real raster
    format; resized output stays a readable real image."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def _lzw_decode(data: bytes, min_code: int, expected: int) -> list:
    """GIF variable-width LZW (LSB-first bit packing, CLEAR/EOI codes,
    width growth to 12 bits). Returns at most `expected` pixel
    indices; a truncated stream ends early rather than raising."""
    clear = 1 << min_code
    eoi = clear + 1
    out: list = []
    bitpos, nbits = 0, len(data) * 8
    width = min_code + 1
    dictionary: list | None = None
    prev: list | None = None
    while len(out) < expected:
        if bitpos + width > nbits:
            break  # truncated stream
        byte = bitpos >> 3
        code = (
            int.from_bytes(data[byte:byte + 3], "little") >> (bitpos & 7)
        ) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            dictionary = [[j] for j in range(clear)] + [None, None]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if dictionary is None:  # encoder skipped the leading CLEAR
            dictionary = [[j] for j in range(clear)] + [None, None]
        if prev is None:
            entry = dictionary[code]
            if entry is None:
                raise ValueError("corrupt GIF LZW stream")
        elif code < len(dictionary) and dictionary[code] is not None:
            entry = dictionary[code]
            dictionary.append(prev + entry[:1])
        elif code == len(dictionary):
            entry = prev + prev[:1]
            dictionary.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(dictionary) == (1 << width) and width < 12:
            width += 1
    return out[:expected]


def _decode_gif(raw: bytes):
    """GIF87a/89a → (h, w) uint8 grayscale of the FIRST image block:
    full variable-width LZW decode, interlace reorder, palette →
    integer ITU-R 601 luminance. Transparency is ignored (the
    transparent index keeps its palette color); animated GIFs decode
    frame 1."""
    import numpy as np

    if raw[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    _sw, _sh, flags = struct.unpack_from("<HHB", raw, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(raw, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(raw):
        b = raw[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + data sub-blocks
            i += 2
            while raw[i] != 0:
                i += 1 + raw[i]
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _lx, _ty, w, h, iflags = struct.unpack_from("<HHHHB", raw, i + 1)
        i += 10
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            pal = np.frombuffer(raw, np.uint8, n * 3, i).reshape(n, 3)
            i += n * 3
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code = raw[i]
        i += 1
        data = bytearray()
        while raw[i] != 0:
            ln = raw[i]
            data += raw[i + 1:i + 1 + ln]
            i += 1 + ln
        idx = _lzw_decode(bytes(data), min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        px = np.array(idx, dtype=np.int64).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows stored in 4 passes
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            out = np.empty_like(px)
            out[order] = px
            px = out
        if int(px.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index beyond palette size")
        lum = (
            (pal[:, 0].astype(np.int64) * 299
             + pal[:, 1].astype(np.int64) * 587
             + pal[:, 2].astype(np.int64) * 114) // 1000
        ).astype(np.uint8)
        return lum[px]
    raise ValueError("GIF contains no image block")


def encode_gif_gray(arr) -> bytes:
    """(h, w) uint8 → GIF87a with a 256-entry gray palette and
    'uncompressed' LZW (literal 9-bit codes with periodic CLEARs so
    the code width never grows) — a real, universally readable GIF.
    Gray palette luminance is exact ((299+587+114)·g // 1000 == g), so
    encode→decode round-trips bit-identically."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # 256-entry GCT
    for g in range(256):
        out += bytes((g, g, g))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW minimum code size
    clear, eoi = 256, 257
    acc = nacc = 0
    payload = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += 9
        while nacc >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    for k, v in enumerate(a.ravel().tolist()):
        emit(v)
        # decoder dict grows by 1 per literal after the first; CLEAR
        # before it reaches 512 so both sides stay at 9-bit codes
        if (k + 1) % 250 == 0:
            emit(clear)
    emit(eoi)
    if nacc:
        payload.append(acc & 0xFF)
    for j in range(0, len(payload), 255):
        chunk = payload[j:j + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _decode_wav(raw: bytes):
    """PCM WAV → (sample_rate, float64 samples, sample_width_bytes) via
    the stdlib wave module (mono mix for multi-channel)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(raw), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    dtype = {1: np.uint8, 2: "<i2", 4: "<i4"}.get(width)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    arr = np.frombuffer(frames, dtype=dtype).astype(np.float64)
    if width == 1:
        arr = arr - 128.0  # 8-bit WAV is unsigned, center it
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    return rate, arr, width


def _walk_riff(raw: bytes, off: int, end: int):
    """Yield (fourcc, list_type_or_None, data_off, data_size) for each
    chunk in a RIFF region; LIST chunks report their subtype and their
    payload region so callers can recurse."""
    while off + 8 <= end:
        fourcc = raw[off:off + 4]
        size = struct.unpack_from("<I", raw, off + 4)[0]
        data_off = off + 8
        if fourcc == b"LIST":
            yield fourcc, raw[data_off:data_off + 4], data_off + 4, size - 4
        else:
            yield fourcc, None, data_off, size
        off = data_off + size + (size & 1)  # chunks are word-aligned


def _avi_headers(raw: bytes):
    """Header-only AVI probe → (width, height, n_frames, bpp,
    compression, palette bytes|None, movi_region|None). Walks the RIFF
    tree once, never touches frame payloads — the O(header) cost a real
    metadata scan pays at scale."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = frames = bpp = comp = None
    pal = movi = None

    def walk(off, end):
        nonlocal w, h, frames, bpp, comp, pal, movi
        for fourcc, ltype, doff, dsz in _walk_riff(raw, off, end):
            if fourcc == b"LIST" and ltype in (b"hdrl", b"strl"):
                walk(doff, doff + dsz)
            elif fourcc == b"LIST" and ltype == b"movi":
                movi = (doff, doff + dsz)
            elif fourcc == b"avih":
                frames = struct.unpack_from("<I", raw, doff + 16)[0]
                w = struct.unpack_from("<I", raw, doff + 32)[0]
                h = struct.unpack_from("<I", raw, doff + 36)[0]
            elif fourcc == b"strf" and bpp is None:
                bw, bh = struct.unpack_from("<ii", raw, doff + 4)
                bpp = struct.unpack_from("<H", raw, doff + 14)[0]
                comp = struct.unpack_from("<I", raw, doff + 16)[0]
                w, h = w or bw, h or abs(bh)
                if dsz > 40:  # palette follows the BITMAPINFOHEADER
                    pal = raw[doff + 40:doff + dsz]

    walk(12, 12 + struct.unpack_from("<I", raw, 4)[0] - 4)
    return w, h, frames, bpp, comp, pal, movi


def _decode_avi(raw: bytes):
    """Uncompressed 8-bpp DIB-in-AVI → list of (h, w) uint8 grayscale
    frames. Real RIFF container parse (hdrl/avih dims, strl/strf
    BITMAPINFOHEADER + palette, movi '00db'/'00dw' frame chunks,
    bottom-up 4-byte-aligned rows, palette → ITU-R 601 luminance like
    ``_decode_bmp``). Compressed streams (MJPG/H.264 fourccs, RLE)
    raise NotImplementedError — those genuinely need ffmpeg."""
    import numpy as np

    w, h, _frames, bpp, comp, pal_raw, movi = _avi_headers(raw)
    if w is None or movi is None:
        raise ValueError("AVI missing avih/movi")
    if comp == MJPG_FOURCC:
        # Motion-JPEG: every '00dc' chunk is a standalone baseline JPEG
        # — decoded by the real JPEG codec above, no ffmpeg needed
        out = []
        for fourcc, _lt, doff, dsz in _walk_riff(raw, movi[0], movi[1]):
            if fourcc[2:4] == b"dc" and dsz:
                out.append(_decode_jpeg(raw[doff:doff + dsz]))
        return out
    if comp != 0 or bpp != 8:
        raise NotImplementedError(
            f"AVI bpp={bpp} compression={comp:#x} unsupported "
            "(only uncompressed 8-bpp DIB or MJPG; other compressed "
            "video needs ffmpeg)"
        )
    if pal_raw:
        n_pal = min(len(pal_raw) // 4, 256)
        pal = np.frombuffer(pal_raw, np.uint8, n_pal * 4).reshape(n_pal, 4)
        lum = (
            (pal[:, 2].astype(np.int64) * 299
             + pal[:, 1].astype(np.int64) * 587
             + pal[:, 0].astype(np.int64) * 114) // 1000
        ).astype(np.uint8)
    else:
        lum = np.arange(256, dtype=np.uint8)  # identity: index == gray
    row_bytes = (w + 3) & ~3
    out = []
    for fourcc, _lt, doff, dsz in _walk_riff(raw, movi[0], movi[1]):
        if fourcc[2:4] in (b"db", b"dw") and dsz >= row_bytes * h:
            px = np.frombuffer(raw, np.uint8, row_bytes * h, doff).reshape(
                h, row_bytes
            )[::-1, :w]  # DIB rows are bottom-up
            if int(px.max(initial=0)) >= len(lum):
                raise ValueError("AVI pixel index beyond palette size")
            out.append(lum[px])
    return out


MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def encode_avi_mjpg(frames, fps: int = 10) -> bytes:
    """List of (h, w) uint8 arrays → Motion-JPEG AVI: biCompression =
    'MJPG', one standalone baseline grayscale JPEG (encode_jpeg_gray)
    per '00dc' chunk — a REAL compressed video format the engine both
    writes and reads end to end."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    payloads = []
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        payloads.append(encode_jpeg_gray(f))
    buf_sz = max(len(p) for p in payloads)

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I", 1_000_000 // fps, buf_sz * fps, 0, 0x10, len(frames),
        0, 1, buf_sz, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      buf_sz, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, MJPG_FOURCC,
                       buf_sz, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body, idx, off = b"", b"", 4
    for data in payloads:
        movi_body += chunk(b"00dc", data)
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(data))
        off += 8 + len(data) + (len(data) & 1)
    body = hdrl + lst(b"movi", movi_body) + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body


def encode_avi_gray(frames, fps: int = 10) -> bytes:
    """List of (h, w) uint8 arrays → minimal standard AVI (one 'vids'
    stream, uncompressed 8-bpp gray-palette DIB frames, idx1 index) —
    the writer twin of ``_decode_avi`` so the video path round-trips a
    REAL container format, mirroring encode_bmp_gray/encode_gif_gray."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    row_bytes = (w + 3) & ~3
    frame_sz = row_bytes * h

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<10I", 1_000_000 // fps, frame_sz * fps, 0, 0x10, len(frames),
        0, 1, frame_sz, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vidsDIB "
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      frame_sz, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    pal = bytes(b for i in range(256) for b in (i, i, i, 0))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_sz,
                       2835, 2835, 256, 0) + pal
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body, idx, off = b"", b"", 4
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one shape")
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, :w] = f
        data = rows[::-1].tobytes()
        movi_body += chunk(b"00db", data)
        idx += b"00db" + struct.pack("<III", 0x10, off, len(data))
        off += 8 + len(data) + (len(data) & 1)
    body = hdrl + lst(b"movi", movi_body) + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body


def _payload(seed: int, n: int) -> bytes:
    out = bytearray(n)
    h = (_A * seed + _B) % _M
    for i in range(n):
        h = (_A * h + _B) % _M
        out[i] = h & 0xFF
    return bytes(out)


def fake_image(seed: int) -> bytes:
    w, h = 16 + seed % 48, 16 + (seed * 7) % 48
    return IMG_MAGIC + struct.pack(">ii", w, h) + _payload(seed, w * h)


def fake_video(seed: int, frames: int | None = None) -> bytes:
    w, h = 8 + seed % 24, 8 + (seed * 3) % 24
    fr = frames if frames is not None else 4 + seed % 12
    return VID_MAGIC + struct.pack(">iii", w, h, fr) + _payload(seed, w * h * fr)


def attach_fake_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary image column for tests/benchmarks (mapInPandas
    so generation is partition-local, like a real blob fetch would be)."""
    cols = df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["image"] = pdf[id_col].map(lambda i: fake_image(int(i)))
            yield pdf

    schema = df.schema.simpleString()[7:-1] + ", image binary"
    return df.mapInPandas(gen, schema=schema)


def _jpeg_dims(raw: bytes):
    """Header-only (h, w) from any SOFn marker — the EXIF-probe path;
    works for progressive streams the full decoder refuses."""
    off = 2
    while off + 4 <= len(raw):
        if raw[off] != 0xFF:
            return None
        while off < len(raw) and raw[off] == 0xFF:
            off += 1
        marker = raw[off]
        off += 1
        if marker in (0xD8, 0x01, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(raw[off:off + 2], "big")
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            seg = raw[off + 2:off + seglen]
            return (int.from_bytes(seg[1:3], "big"),
                    int.from_bytes(seg[3:5], "big"))
        if marker == 0xDA:
            return None
        off += seglen
    return None


def image_metadata(df: DataFrame, bin_col: str = "image") -> DataFrame:
    """(…, width int, height int, format string) parsed from the binary
    header — Arrow-batched; this is the shape a real EXIF/codec probe
    takes at scale (decode headers only, never the full payload)."""
    id_cols = [c for c in df.columns if c != bin_col]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, hh, fmt = [], [], []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] == IMG_MAGIC:
                    a, c = struct.unpack(">ii", raw[8:16])
                    w.append(a); hh.append(c); fmt.append("fakeimg")
                elif raw[:8] == VID_MAGIC:
                    a, c, _fr = struct.unpack(">iii", raw[8:20])
                    w.append(a); hh.append(c); fmt.append("fakevid")
                elif raw[:2] == b"BM":
                    a, c = struct.unpack_from("<ii", raw, 18)
                    w.append(a); hh.append(abs(c)); fmt.append("bmp")
                elif raw[:8] == PNG_MAGIC:
                    a, c = struct.unpack_from(">II", raw, 16)  # IHDR w,h
                    w.append(a); hh.append(c); fmt.append("png")
                elif raw[:6] in GIF_MAGICS:
                    a, c = struct.unpack_from("<HH", raw, 6)
                    w.append(a); hh.append(c); fmt.append("gif")
                elif raw[:3] == b"\xff\xd8\xff":
                    d = _jpeg_dims(raw)
                    w.append(d[1] if d else None)
                    hh.append(d[0] if d else None)
                    fmt.append("jpeg")
                elif raw[:2] in (b"P5", b"P6"):
                    arr = _decode_pnm(raw)  # header-light format
                    w.append(arr.shape[1]); hh.append(arr.shape[0])
                    fmt.append("pgm" if raw[:2] == b"P5" else "ppm")
                elif raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    a, c, _fr, _bpp, _cm, _p, _m = _avi_headers(raw)
                    w.append(a); hh.append(c); fmt.append("avi")
                else:
                    w.append(None); hh.append(None); fmt.append("unknown")
            out = pdf[id_cols].copy()
            out["width"], out["height"], out["format"] = w, hh, fmt
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(probe, schema=base + ", width int, height int, format string")


def image_features(df: DataFrame, bin_col: str = "image") -> DataFrame:
    """Decode + feature-extract. With a real codec this would produce
    embeddings; the stub computes deterministic payload statistics
    (mean/min/max byte) so the full pipeline — including downstream
    similarity joins — is exercised. Raises NotImplementedError for real
    image formats until a codec library is present."""
    id_cols = [c for c in df.columns if c != bin_col]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            mean, mn, mx = [], [], []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] == IMG_MAGIC:
                    arr = np.frombuffer(raw[16:], dtype=np.uint8)
                elif raw[:2] == b"BM":
                    arr = _decode_bmp(raw).ravel()  # real decode path
                elif raw[:8] == PNG_MAGIC:
                    arr = _decode_png(raw).ravel()  # real decode path
                elif raw[:6] in GIF_MAGICS:
                    arr = _decode_gif(raw).ravel()  # real decode path
                elif raw[:3] == b"\xff\xd8\xff":
                    arr = _decode_jpeg(raw).ravel()  # real decode path
                elif raw[:2] in (b"P5", b"P6"):
                    arr = _decode_pnm(raw).ravel()  # real decode path
                elif _HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError("real codec path not wired")
                else:
                    raise NotImplementedError(
                        "image decode beyond BMP/PNG/GIF/JPEG/PNM needs "
                        "PIL/ffmpeg — not in this container"
                    )
                mean.append(float(arr.mean()) if arr.size else 0.0)
                mn.append(int(arr.min()) if arr.size else 0)
                mx.append(int(arr.max()) if arr.size else 0)
            out = pdf[id_cols].copy()
            out["px_mean"], out["px_min"], out["px_max"] = mean, mn, mx
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(
        feats, schema=base + ", px_mean double, px_min int, px_max int"
    )


def fake_audio(seed: int) -> bytes:
    rate = 8000 + 4000 * (seed % 3)
    n = 256 + (seed * 13) % 512
    return AUD_MAGIC + struct.pack(">ii", rate, n) + _payload(seed, n)


def attach_fake_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary audio column (FAKEAUD1: sample_rate,
    n_samples, u8 samples) — same mapInPandas batch shape a real
    WARC/audio payload loader would use."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["audio"] = [fake_audio(int(i)) for i in pdf[id_col]]
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields)
    return df.mapInPandas(gen, schema=base + ", audio binary")


def attach_fake_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary video column (FAKEVID1: w, h, frames, u8
    frame payloads) — same mapInPandas batch shape as the image/audio
    attachers."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["video"] = [fake_video(int(i)) for i in pdf[id_col]]
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields)
    return df.mapInPandas(gen, schema=base + ", video binary")


def audio_features(df: DataFrame, bin_col: str = "audio") -> DataFrame:
    """Decode + per-clip features: sample rate, duration, RMS level.
    Stub decode over FAKEAUD1 (real formats raise NotImplementedError
    until an audio library is present)."""
    id_cols = [c for c in df.columns if c != bin_col]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rate, dur, rms = [], [], []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] == AUD_MAGIC:
                    r, n = struct.unpack(">ii", raw[8:16])
                    arr = np.frombuffer(
                        raw[16:16 + n], dtype=np.uint8
                    ).astype("float64")
                elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    r, arr, _w = _decode_wav(raw)  # real decode path
                    n = arr.size
                else:
                    raise NotImplementedError(
                        "audio decode beyond PCM WAV needs an audio "
                        "library — not in this container; WAV and "
                        "FAKEAUD1 are supported"
                    )
                rate.append(r)
                dur.append(n / r)
                rms.append(float(np.sqrt((arr ** 2).mean())) if n else 0.0)
            out = pdf[id_cols].copy()
            out["sample_rate"], out["duration_sec"], out["rms"] = rate, dur, rms
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(
        feats, schema=base + ", sample_rate int, duration_sec double, rms double"
    )


def image_resize(
    df: DataFrame, width: int, height: int, bin_col: str = "image"
) -> DataFrame:
    """Resize to (width, height) — nearest-neighbor sampling over the
    FAKEIMG1 container (deterministic, so the Spark-side plumbing,
    schema, and batch shape are fully tested); real formats raise
    NotImplementedError until a codec library is present. Output keeps
    the container format, so resized images feed back into
    image_metadata/image_features."""
    id_cols = [c for c in df.columns if c != bin_col]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_bytes = []
            for b in pdf[bin_col]:
                raw = bytes(b)
                if raw[:8] == IMG_MAGIC:
                    w, h = struct.unpack(">ii", raw[8:16])
                    arr = np.frombuffer(raw[16:16 + w * h], dtype=np.uint8)
                    arr = arr.reshape(h, w)
                    fmt = "fake"
                elif raw[:2] == b"BM":
                    arr = _decode_bmp(raw)  # real decode path
                    h, w = arr.shape
                    fmt = "bmp"
                elif raw[:8] == PNG_MAGIC:
                    arr = _decode_png(raw)  # real decode path
                    h, w = arr.shape
                    fmt = "png"
                elif raw[:6] in GIF_MAGICS:
                    arr = _decode_gif(raw)  # real decode path
                    h, w = arr.shape
                    fmt = "gif"
                elif raw[:2] in (b"P5", b"P6"):
                    arr = _decode_pnm(raw)  # real decode path
                    h, w = arr.shape
                    fmt = "pnm"
                elif raw[:3] == b"\xff\xd8\xff":
                    arr = _decode_jpeg(raw)  # real decode path
                    h, w = arr.shape
                    fmt = "jpeg"
                else:
                    raise NotImplementedError(
                        "image decode beyond BMP/PNG/GIF/JPEG/PNM needs "
                        "PIL/ffmpeg — not in this container"
                    )
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                resized = arr[np.ix_(ys, xs)]
                # each real format round-trips to itself, so resized
                # output feeds back through metadata/features
                if fmt == "bmp":
                    out_bytes.append(encode_bmp_gray(resized))
                elif fmt == "png":
                    out_bytes.append(encode_png_gray(resized))
                elif fmt == "gif":
                    out_bytes.append(encode_gif_gray(resized))
                elif fmt == "pnm":
                    out_bytes.append(encode_pgm_gray(resized))
                elif fmt == "jpeg":
                    out_bytes.append(encode_jpeg_gray(resized))
                else:
                    out_bytes.append(
                        IMG_MAGIC
                        + struct.pack(">ii", width, height)
                        + resized.tobytes()
                    )
            out = pdf[id_cols].copy()
            out[bin_col] = out_bytes
            yield out

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(resize, schema=base + f", {bin_col} binary")


def frame_sample(df: DataFrame, bin_col: str = "video", every_n: int = 2) -> DataFrame:
    """Explode a video binary into sampled frame rows (one binary per
    kept frame) — the fan-out shape of real frame extraction; partitions
    stay balanced because the explode happens inside the Arrow batch."""
    id_cols = [c for c in df.columns if c != bin_col]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in id_cols}
            rows.update({"frame_idx": [], "frame": []})
            for _, r in pdf.iterrows():
                raw = bytes(r[bin_col])
                if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    # real container path: sampled frames come back out
                    # as readable 8-bpp BMPs so the image operators
                    # (metadata/features/resize) compose downstream
                    for k, fr_arr in enumerate(_decode_avi(raw)):
                        if k % every_n:
                            continue
                        for c in id_cols:
                            rows[c].append(r[c])
                        rows["frame_idx"].append(k)
                        rows["frame"].append(encode_bmp_gray(fr_arr))
                    continue
                if raw[:8] != VID_MAGIC:
                    raise NotImplementedError(
                        "video decode beyond uncompressed-DIB AVI needs "
                        "ffmpeg — not in this container"
                    )
                w, h, fr = struct.unpack(">iii", raw[8:20])
                fsz = w * h
                for k in range(0, fr, every_n):
                    for c in id_cols:
                        rows[c].append(r[c])
                    rows["frame_idx"].append(k)
                    rows["frame"].append(raw[20 + k * fsz:20 + (k + 1) * fsz])
            yield pd.DataFrame(rows)

    base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields if f.name != bin_col)
    return df.mapInPandas(
        sample, schema=base + ", frame_idx int, frame binary"
    )
