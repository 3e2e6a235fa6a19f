"""REAL baseline-JPEG codec — stdlib + numpy only, no codec libraries.

Decoder: baseline sequential DCT (SOF0) with canonical Huffman tables
(DHT), DQT dequantization, zigzag, orthonormal 8x8 IDCT as a numpy
matrix product, chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0, restart
markers (DRI/RSTn), and BT.601 full-range YCbCr->RGB. Progressive
(SOF2), arithmetic coding, and 12-bit precision raise cleanly.

Encoder: an independent FORWARD twin for tests (like encode_png /
encode_gif): 4:4:4 or 4:2:0, spec Annex-K Huffman tables, caller-chosen
quantization (all-ones tables give near-lossless roundtrips so the
decoder is testable to tight pixel tolerances without an external
reference codec).

This closes the last image-format stub in operators/multimodal.py
(reference scope: the engine treats media as opaque binary columns —
multimodal curation features need pixels; py3dtiles itself has no image
path, this is the webtext-pipeline half of the graft).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_k = np.arange(8)
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1)
                                   * _k[:, None] * np.pi / 16.0)
_DCT[0] /= np.sqrt(2.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _DCT.T @ block @ _DCT


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


# JPEG Annex K typical Huffman tables: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _canonical_codes(bits, values):
    """(code, length) per symbol, canonical JPEG assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder

class _BitReader:
    """MSB-first entropy-segment reader: unstuffs 0xFF00, stops at any
    other marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:       # RSTn handled by caller
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"marker 0xFF{nxt:02x} inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_consume_rst(self):
        self.acc = 0
        self.nbits = 0
        if (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


class _HuffTable:
    def __init__(self, bits, values):
        # mincode/maxcode/valptr per length — the spec's decode procedure
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while length <= 16:
            if self.maxcode[length] >= 0 and code <= self.maxcode[length]:
                return self.values[self.valptr[length]
                                   + code - self.mincode[length]]
            code = (code << 1) | br.read_bit()
            length += 1
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to uint8 (h, w, 3) RGB
    (greyscale replicated). Truncated payloads raise ValueError
    (ADVICE r6: the segment walk otherwise escaped as
    IndexError/struct.error, inconsistent with decode_png/decode_bmp's
    error contract)."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as e:
        raise ValueError("truncated JPEG") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # spec-legal 0xFF fill bytes may pad the space before a marker
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                        # standalone
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:                  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    tbl = np.frombuffer(seg, dtype=">u2", count=64,
                                        offset=i).astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64,
                                        offset=i).astype(np.int32)
                    i += 64
                qt[tq] = tbl
        elif marker == 0xC4:                # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                values = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, values)
                i += 17 + n
        elif marker == 0xC0:                # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0xFF{marker:02x}"
                             " (baseline SOF0 only)")
        elif marker == 0xDD:                # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                # SOS -> entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            return _decode_scan(payload, pos + seglen, frame, scan, qt,
                                huff, restart_interval)
        pos += seglen
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = np.zeros(
            (mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64)
    br = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.align_and_consume_rst()
                pred = {k: 0 for k in pred}
            try:
                for comp, dc_id, ac_id in scan:
                    dc_tbl = huff[(0, dc_id)]
                    ac_tbl = huff[(1, ac_id)]
                    q = qt[comp["tq"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = _decode_block(br, dc_tbl, ac_tbl, q,
                                                pred, comp["id"])
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = blk
            except _RestartMarker:
                raise ValueError("restart marker misaligned with DRI")
            mcu_count += 1
    out = []
    for comp, _, _ in scan:
        p = planes[comp["id"]]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0] + 128.0, 0, 255).round().astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255) \
        .round().astype(np.uint8)


def _decode_block(br, dc_tbl, ac_tbl, q, pred, cid):
    zz = np.zeros(64, dtype=np.int64)
    size = dc_tbl.decode(br)
    diff = _extend(br.read_bits(size), size)
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = ac_tbl.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:                   # ZRL
                k += 16
                continue
            break                           # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    blk = np.zeros(64, dtype=np.float64)
    blk[ZIGZAG] = zz * q
    return _idct2(blk.reshape(8, 8))


# ---------------------------------------------------------------------------
# encoder (forward twin for tests)

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)                # pad with 1s per spec


def _encode_block(bw, blk, q, dc_codes, ac_codes, pred, cid):
    coef = np.round(_dct2(blk) / q.reshape(8, 8)).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred[cid]
    pred[cid] = int(zz[0])
    size = int(diff).bit_length() if diff else 0
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]       # ZRL
            bw.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, ln = ac_codes[0x00]           # EOB
        bw.write(code, ln)


def _seg(marker: int, body: bytes) -> bytes:
    """One marker segment: FF xx + big-endian length (incl. itself)."""
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _check_quant(quant: int) -> np.ndarray:
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in [1, 255] (the encoder twin "
                         "writes 8-bit DQT tables)")
    return np.full(64, quant, dtype=np.int32)


def _encode_gray(y: np.ndarray, h: int, w: int, quant: int,
                 restart_interval: int) -> bytes:
    """Single-component (grayscale) baseline frame — exercises the
    decoder's 1-component scan and Y-replication path."""
    q = _check_quant(quant)
    ph = -(-y.shape[0] // 8) * 8
    pw = -(-y.shape[1] // 8) * 8
    y = np.pad(y, ((0, ph - y.shape[0]), (0, pw - y.shape[1])),
               mode="edge")
    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    bw = _BitWriter()
    pred = {1: 0}
    mcu_count = 0
    rst = 0
    for my in range(ph // 8):
        for mx in range(pw // 8):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = {1: 0}
            mcu_count += 1
            _encode_block(bw, y[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8],
                          q, dc_l, ac_l, pred, 1)
    bw.flush()
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + q.astype(np.uint8).tobytes())
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUM[0]) + bytes(_DC_LUM[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_LUM[0]) + bytes(_AC_LUM[1]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(img: np.ndarray, quant: int = 1,
                subsample: bool | str = False,
                restart_interval: int = 0,
                grayscale: bool = False) -> bytes:
    """Baseline-JPEG forward twin: 4:4:4 (default), 4:2:0
    (`subsample=True` or "420"), or 4:2:2 (`subsample="422"`); a
    single-component grayscale frame with `grayscale=True`. Flat
    quantization `quant` for both tables (1 = near-lossless), Annex-K
    Huffman tables, optional DRI/RSTn restart markers every
    `restart_interval` MCUs."""
    if subsample not in (False, True, "420", "422"):
        raise ValueError(f"unknown subsample mode {subsample!r} "
                         "(False, True/'420', or '422')")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    if grayscale:
        g = f if f.ndim == 2 else (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
                                   + 0.114 * f[:, :, 2])
        return _encode_gray(g - 128.0, h, w, quant, restart_interval)
    y = (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1]
         + 0.114 * f[:, :, 2]) - 128.0
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]
    q = _check_quant(quant)

    def pad(p, mult_y, mult_x=None):
        mult_x = mult_y if mult_x is None else mult_x
        ph = -(-p.shape[0] // mult_y) * mult_y
        pw = -(-p.shape[1] // mult_x) * mult_x
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    if subsample == "422":
        ysamp, csamp = (2, 1), (1, 1)          # horizontal-only chroma
        y = pad(y, 8, 16)

        def down(p):                            # 2x1 box-average
            p = pad(p, 1, 2)
            return (p[:, 0::2] + p[:, 1::2]) / 2.0
        cb, cr = pad(down(cb), 8), pad(down(cr), 8)
    elif subsample:
        ysamp, csamp = (2, 2), (1, 1)
        y = pad(y, 16)

        # 2x2 box-average, then pad to the chroma MCU grid
        def down(p):
            p = pad(p, 2)
            return (p[0::2, 0::2] + p[0::2, 1::2]
                    + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        cb, cr = pad(down(cb), 8), pad(down(cr), 8)
    else:
        ysamp, csamp = (1, 1), (1, 1)
        y, cb, cr = pad(y, 8), pad(cb, 8), pad(cr, 8)

    dc_l = _canonical_codes(*_DC_LUM)
    dc_c = _canonical_codes(*_DC_CHR)
    ac_l = _canonical_codes(*_AC_LUM)
    ac_c = _canonical_codes(*_AC_CHR)
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    mcux = y.shape[1] // (8 * ysamp[0])
    mcuy = y.shape[0] // (8 * ysamp[1])
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = {1: 0, 2: 0, 3: 0}
            mcu_count += 1
            for by in range(ysamp[1]):
                for bx in range(ysamp[0]):
                    y0 = (my * ysamp[1] + by) * 8
                    x0 = (mx * ysamp[0] + bx) * 8
                    _encode_block(bw, y[y0:y0 + 8, x0:x0 + 8], q,
                                  dc_l, ac_l, pred, 1)
            for plane, cid in ((cb, 2), (cr, 3)):
                _encode_block(bw, plane[my * 8:my * 8 + 8,
                                        mx * 8:mx * 8 + 8], q,
                              dc_c, ac_c, pred, cid)
    bw.flush()

    def dht(tc, th, bits, values):
        return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits)
                    + bytes(values))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + q.astype(np.uint8).tobytes())
    out += _seg(0xDB, b"\x01" + q.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, ysamp[0] << 4 | ysamp[1], 0])
    sof += bytes([2, csamp[0] << 4 | csamp[1], 1])
    sof += bytes([3, csamp[0] << 4 | csamp[1], 1])
    out += _seg(0xC0, sof)
    out += dht(0, 0, *_DC_LUM) + dht(1, 0, *_AC_LUM)
    out += dht(0, 1, *_DC_CHR) + dht(1, 1, *_AC_CHR)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
