"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media ride as opaque `binary` columns with typed metadata structs; the
Spark-side plumbing — schemas, Arrow batch shapes, partition-friendly
grouped processing — is real and tested. `probe_media` is REAL (container
header parsing — PNG/JPEG/GIF/BMP dimensions, WAV audio params — pure
byte slicing, no codec library), the AUDIO decode is REAL
(decode_wav: stdlib wave + numpy PCM -> samples; audio_features computes
duration/RMS/peak/zero-crossing curation signals on actual samples), and
since r6 the PNG IMAGE decode is REAL too (decode_png/encode_png:
stdlib-zlib IDAT inflate + per-scanline unfilter — Sub/Up/Average/Paeth —
in numpy; 8-bit grey/grey-alpha/RGB/RGBA, the training-corpus common
case). Non-PNG formats (JPEG entropy decode needs a codec library) still
raise NotImplementedError from `decode_image` unless `fake=True`, whose
deterministic pseudo-pixels keep downstream plumbing exercisable for any
format.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, duration_ms int")


def synth_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes)."""
    df = spark.range(n)
    return df.select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.md5(F.col("id").cast("string")), "UTF-8").alias("payload"),
        (F.lit(16) + (F.col("id") % 4).cast("int") * 16).alias("width"),
        (F.lit(16) + (F.col("id") % 3).cast("int") * 16).alias("height"),
        ((F.col("id") % 10 + 1) * 1000).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-pixels: repeatable uint8 (h, w, 3) from bytes."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channel count (8-bit depth only; palette needs PLTE
# indirection and is rare in training corpora — rejected explicitly)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(b: bytes):
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i:i + 4])
        ctype = b[i + 4:i + 8]
        yield ctype, b[i + 8:i + 8 + length]
        if ctype == b"IEND":
            return
        i += 12 + length                      # len + type + data + CRC


def decode_png(payload: bytes) -> np.ndarray:
    """REAL stdlib-only PNG decode: zlib-inflate the IDAT stream, then
    invert the per-scanline filters (None/Sub/Up/Average/Paeth, RFC 2083
    §6) with numpy row arithmetic. Supports 8-bit depth, color types
    0 (grey), 2 (RGB), 4 (grey+alpha), 6 (RGBA), non-interlaced — the
    common web/training-corpus case. Returns uint8 (h, w, channels).

    Up is a whole-row vector add; Sub is a per-channel prefix sum
    (cumsum mod 256); Average/Paeth predictors depend nonlinearly on the
    left neighbor, so those rows walk pixels — per-image cost inside the
    Arrow-batched kernel, never per-row-of-DataFrame Python."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    w = h = ctype_code = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13])
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            ctype_code = color
        elif ctype == b"IDAT":
            idat.append(data)
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _PNG_CHANNELS[ctype_code]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int32)
        if f == 0:                                   # None
            rec = cur
        elif f == 1:                                 # Sub
            rec = cur.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:                                 # Up
            rec = cur + prev
        elif f == 3:                                 # Average
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                rec[x] = (cur[x] + (a + int(prev[x])) // 2) % 256
        elif f == 4:                                 # Paeth
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b_ = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b_ if pb <= pc else c)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
        prev = (rec % 256).astype(np.uint8)
        out[y] = prev
    return out.reshape(h, w, ch)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (stdlib zlib + crc32): 8-bit grey/grey-alpha/
    RGB/RGBA from uint8 (h, w[, c]). `filter_type` applies one filter to
    every scanline (0..4) — the non-zero types exist so tests can pin the
    decoder's unfilter logic against an independently-written FORWARD
    filter, not just a roundtrip of the trivial case."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    img = img.astype(np.uint8)
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        else:
            raise ValueError(f"bad filter_type {filter_type}")
        lines.append(bytes([filter_type])
                     + (enc % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL uncompressed-BMP decode (BI_RGB, 24/32-bit): pure header
    arithmetic + one numpy reshape. Rows are stored bottom-up (top-down
    when biHeight < 0) and 4-byte padded; pixel order is BGR(A).
    Returns uint8 (h, w, 3|4) in RGB(A) order."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    w, h_signed = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    h = abs(h_signed)
    ch = bpp // 8
    row_bytes = (w * ch + 3) & ~3
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=row_bytes * h, offset=data_off)
    rows = rows.reshape(h, row_bytes)[:, :w * ch].reshape(h, w, ch)
    if h_signed > 0:
        rows = rows[::-1]                 # bottom-up storage
    return rows[:, :, [2, 1, 0] if ch == 3 else [2, 1, 0, 3]]


_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW (LSB-first bit packing, CLEAR/END codes, table
    capped at 4095). Returns uint8 palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"bad GIF LZW code {code}")
        out[n_out:n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError("GIF pixel data incomplete")
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """REAL GIF decode (stdlib bit-twiddling + numpy): first image frame,
    global or local palette, optional interlacing. Returns uint8
    (h, w, 3) RGB. Animation frames past the first, transparency, and
    disposal are out of scope (curation features need pixels, not
    playback). Truncated payloads raise ValueError (ADVICE r6: the
    block walk otherwise escaped as IndexError/struct.error,
    inconsistent with decode_png/decode_bmp's error contract)."""
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:
        raise ValueError("truncated GIF") from e


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh, packed = struct.unpack("<HHB", payload[6:11])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:                       # extension: skip sub-blocks
            pos += 1                            # label
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:                     # image descriptor
            _, _, w, h, ipacked = struct.unpack("<HHHHB",
                                                payload[pos:pos + 9])
            pos += 9
            pal = gct
            if ipacked & 0x80:                  # local color table
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                    offset=pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(b"".join(chunks), min_code, w * h)
            img = idx.reshape(h, w)
            if ipacked & 0x40:                  # deinterlace (4 passes)
                out = np.empty_like(img)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    rows = range(start, h, step)
                    out[list(rows)] = img[src:src + len(rows)]
                    src += len(rows)
                img = out
            return pal[img]
        elif block == 0x3B:                     # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Independent FORWARD twin for tests (like encode_png): single-frame
    GIF89a with a global palette built from the image's distinct colors
    (<= 256) and a width-capped LZW stream (literal codes with CLEAR
    resets before the decoder's table would force a width bump — valid
    per spec, deliberately not the decoder's algorithm in reverse)."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif supports <= 256 distinct colors")
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    n_pal = 1 << bits
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[:len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    ipacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    min_code = bits
    clear, end = 1 << min_code, (1 << min_code) + 1
    codes = []
    # decoder table grows by one per literal after the first post-clear
    # code; reset before next_code reaches 1 << (min_code + 1)
    budget = (1 << (min_code + 1)) - (clear + 2)
    pixels = idx.reshape(h, w)
    if interlace:
        order = [r for start, step in _GIF_INTERLACE_PASSES
                 for r in range(start, h, step)]
        pixels = pixels[order]
    stream = pixels.reshape(-1)
    codes.append(clear)
    since_clear = 0
    for px in stream:
        if since_clear >= budget:
            codes.append(clear)
            since_clear = 0
        codes.append(int(px))
        since_clear += 1
    codes.append(end)
    acc = nbits = 0
    data = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += min_code + 1
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(payload: bytes, width: int, height: int,
                 fake: bool = False) -> np.ndarray:
    """Decode to uint8 (h, w, 3). PNG, GIF, baseline JPEG, and
    uncompressed-BMP payloads all decode for REAL (decode_png /
    decode_gif / jpeg.decode_jpeg / decode_bmp; grey/alpha channels
    normalized to RGB); anything else raises unless `fake=True`."""
    if fake:
        return _fake_decode(payload, width, height)
    if payload[:8] == _PNG_MAGIC:
        img = decode_png(payload)
        ch = img.shape[2]
        if ch == 1:
            return np.repeat(img, 3, axis=2)
        if ch == 2:                       # grey+alpha -> RGB, drop alpha
            return np.repeat(img[:, :, :1], 3, axis=2)
        return img[:, :, :3]              # RGB / RGBA (alpha dropped)
    if payload[:2] == b"BM":
        return np.ascontiguousarray(decode_bmp(payload)[:, :, :3])
    if payload[:6] in _GIF_MAGICS:
        return np.ascontiguousarray(decode_gif(payload))
    if payload[:2] == b"\xff\xd8":
        from py3dtiles_spark.operators.jpeg import decode_jpeg
        return decode_jpeg(payload)
    raise NotImplementedError(
        "real decode implemented for PNG, GIF, baseline JPEG, and "
        "uncompressed BMP (stdlib + numpy); pass fake=True for the "
        "deterministic stub on anything else")


def probe_media_bytes(payload: bytes) -> dict:
    """REAL (codec-free) container-header probe: format + dimensions /
    audio params straight from the byte layout — no image/audio library
    needed. Supports PNG (IHDR), JPEG (SOFn scan), GIF, BMP, WAV (RIFF
    chunk walk). Unknown formats -> format='unknown', fields None."""
    import struct as _s
    out = {"format": "unknown", "width": None, "height": None,
           "sample_rate": None, "channels": None, "duration_ms": None}
    b = payload
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = _s.unpack(">II", b[16:24])
        out.update(format="png", width=w, height=h)
    elif len(b) >= 4 and b[:2] == b"\xff\xd8":
        out["format"] = "jpeg"
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = _s.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = _s.unpack(">HH", b[i + 5:i + 9])
                out.update(width=w, height=h)
                break
            i += 2 + seglen
    elif len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = _s.unpack("<HH", b[6:10])
        out.update(format="gif", width=w, height=h)
    elif len(b) >= 26 and b[:2] == b"BM":
        w, h = _s.unpack("<ii", b[18:26])
        out.update(format="bmp", width=w, height=abs(h))
    elif (len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
        out["format"] = "wav"
        i = 12
        rate = channels = bits = data_size = None
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            csz = _s.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                channels, rate = _s.unpack("<HI", b[i + 10:i + 16])
                bits = _s.unpack("<H", b[i + 22:i + 24])[0]
            elif cid == b"data":
                data_size = csz
            i += 8 + csz + (csz & 1)
        if rate and channels and bits and data_size is not None:
            out.update(sample_rate=rate, channels=channels,
                       duration_ms=int(data_size * 8000
                                       / (rate * channels * bits)))
    return out


def probe_media(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Distributed header probe over a binary media column (Arrow-batched;
    the probe itself is pure byte slicing — no codecs)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                info = probe_media_bytes(bytes(payload))
                rows.append((int(mid), info["format"], info["width"],
                             info["height"], info["sample_rate"],
                             info["channels"], info["duration_ms"]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "format", "width", "height", "sample_rate",
                "channels", "duration_ms"])

    return (media.select("media_id", payload_col)
            .mapInPandas(run, schema="media_id long, format string, "
                                     "width int, height int, "
                                     "sample_rate int, channels int, "
                                     "duration_ms int"))


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode -> per-channel mean/std features. mapInPandas; the Arrow batch
    carries (media_id, payload, width, height); output is narrow floats.
    With fake=False, PNG payloads decode for REAL (decode_png) and
    undecodable payloads yield decode_ok=false lineage rows (same contract
    as audio_features); with fake=True every payload 'decodes' via the
    deterministic stub, so the column is uniformly true."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, payload, w, h in zip(pdf["media_id"], pdf["payload"],
                                          pdf["width"], pdf["height"]):
                mid = -1 if mid is None or pd.isna(mid) else int(mid)
                try:
                    img = decode_image(bytes(payload), int(w), int(h),
                                       fake=fake)
                    feats.append((mid, True,
                                  *img.mean(axis=(0, 1)).tolist(),
                                  float(img.std())))
                except Exception:
                    feats.append((mid, False, 0.0, 0.0, 0.0, 0.0))
            yield pd.DataFrame(feats, columns=[
                "media_id", "decode_ok", "mean_r", "mean_g", "mean_b",
                "std_all"])

    return (media.filter("kind = 'image'")
            .select("media_id", "payload", "width", "height")
            .mapInPandas(run, schema="media_id long, decode_ok boolean, "
                                     "mean_r double, "
                                     "mean_g double, mean_b double, "
                                     "std_all double"))


def resize_image(media: DataFrame, out_w: int, out_h: int,
                 fake: bool = True) -> DataFrame:
    """Nearest-neighbor resize on the decoded pixels; returns re-encoded
    raw bytes + new dims (the Spark plumbing for a real resize UDF).

    Sample indices come from the DECODED array's own shape, never the
    metadata width/height columns (a metadata/pixel mismatch must not
    crash the stage). Undecodable payloads are dropped — resize is a
    transform; run `image_features(fake=False)` for decode_ok lineage."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, w, h in zip(pdf["media_id"], pdf["payload"],
                                          pdf["width"], pdf["height"]):
                try:
                    img = decode_image(bytes(payload), int(w), int(h),
                                       fake=fake)
                except Exception:
                    continue
                ih, iw = img.shape[0], img.shape[1]
                yi = (np.arange(out_h) * ih // out_h)
                xi = (np.arange(out_w) * iw // out_w)
                small = img[yi][:, xi]
                rows.append((int(mid), small.tobytes(), out_w, out_h))
            yield pd.DataFrame(rows, columns=["media_id", "payload",
                                              "width", "height"])

    return (media.filter("kind = 'image'")
            .select("media_id", "payload", "width", "height")
            .mapInPandas(run, schema="media_id long, payload binary, "
                                     "width int, height int"))


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (native explode of a sequence — the decode itself would slot into a
    downstream mapInPandas like image_features)."""
    return (media.filter("kind = 'video'")
            .withColumn("frame_ts_ms", F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1,
                           F.lit(every_ms))))
            .select("media_id", "frame_ts_ms", "payload"))


# ------------------------------------------------------------- audio (REAL) --
# WAV/PCM is the one media codec decodable with the stdlib alone (`wave`
# + numpy frombuffer) — so unlike the image path, the audio decode is
# REAL, not a stub: bytes in, samples out, features computed on actual
# PCM. 8/16/32-bit integer PCM, any channel count.

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (float64 samples in [-1, 1], shape (n, channels),
    sample_rate). Raises ValueError for non-PCM/compressed WAV."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate, nframes = (w.getnchannels(), w.getsampwidth(),
                                  w.getframerate(), w.getnframes())
        raw = w.readframes(nframes)
    if sw == 1:                         # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return x.reshape(-1, nch), rate


def audio_features(media: DataFrame, frame_ms: int = 0) -> DataFrame:
    """REAL audio feature extraction over WAV payloads (Arrow-batched
    mapInPandas, one output row per clip): duration, RMS level, peak,
    zero-crossing rate — the standard cheap curation signals (silence /
    clipping / noise gates for a speech corpus). Undecodable payloads are
    dropped with decode_ok=false rows retained for lineage."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # normalize the id FIRST: a NULL media_id must yield a
                # lineage row too, not re-raise inside the except handler
                mid = -1 if mid is None or pd.isna(mid) else int(mid)
                try:
                    x, rate = decode_wav(bytes(payload))
                    mono = x.mean(axis=1)
                    n = len(mono)
                    if n == 0 or rate == 0:
                        # a zero-frame (or zero-rate) WAV is a VALID decode
                        # of an empty clip, not a failure: decode_ok stays
                        # True with zeroed features so the lineage
                        # distinguishes "empty" from "corrupt"
                        rows.append((mid, True, 0.0, 0.0, 0.0, 0.0,
                                     int(rate), x.shape[1]))
                        continue
                    zc = (np.count_nonzero(np.diff(np.signbit(mono)))
                          / max(n - 1, 1))
                    rows.append((mid, True, n / rate,
                                 float(np.sqrt(np.mean(mono * mono))),
                                 float(np.max(np.abs(mono))), float(zc),
                                 int(rate), x.shape[1]))
                except Exception:
                    rows.append((mid, False, 0.0, 0.0, 0.0, 0.0, 0, 0))
            yield pd.DataFrame(rows, columns=[
                "media_id", "decode_ok", "duration_s", "rms", "peak",
                "zcr", "sample_rate", "channels"])

    return (media.filter("kind = 'audio'")
            .select("media_id", "payload")
            .mapInPandas(run, schema="media_id long, decode_ok boolean, "
                                     "duration_s double, rms double, "
                                     "peak double, zcr double, "
                                     "sample_rate int, channels int"))
