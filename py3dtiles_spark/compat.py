"""Drop-in compatibility facade for the reference py3dtiles PUBLIC API
(`from py3dtiles import TileContentReader, Feature, Pnts, B3dm, GlTF,
TriangleSoup, convert_to_ecef` — reference __init__.py:1-14), so code
written against the reference's library surface runs unchanged on this
engine's codecs. Thin adapters only: every byte goes through
sources/pnts.py, sources/b3dm.py and functions/wkb.py; the sole logic
owned here is the reference's feature-table JSON serialization
convention (json.dumps with spaces stripped, pad-to-4 with 1..4 spaces —
feature_table.py:116-121), which the reference's own byte-length
assertions (tests/test_pc.py) pin.

The distributed engine does NOT use these classes (DataFrames + binary
columns everywhere); they exist for migration and for running the
reference's test patterns verbatim (tests/test_compat.py).
"""

from __future__ import annotations

import json
import struct
from types import SimpleNamespace

import numpy as np

from py3dtiles_spark.functions.crs import convert_to_ecef  # noqa: F401
from py3dtiles_spark.sources.b3dm import (
    b3dm_bytes, glb_bytes, gltf_from_arrays, parse_b3dm)
from py3dtiles_spark.sources.pnts import PNTS_HEADER_LEN
from py3dtiles_spark.functions.wkb import (
    data_triangles_to_array, triangles_to_arrays, wkb_to_triangles)


class Feature:
    """Reference feature_table.py Feature: positions/colors dicts."""

    def __init__(self):
        self.positions = {}
        self.colors = {}

    @staticmethod
    def from_values(x, y, z, red=None, green=None, blue=None):
        f = Feature()
        f.positions = {"X": x, "Y": y, "Z": z}
        # reference quirk preserved: an all-zero color counts as "no
        # color" (feature_table.py:32 `if red or green or blue`)
        f.colors = ({"Red": red, "Green": green, "Blue": blue}
                    if (red or green or blue) else {})
        return f

    @staticmethod
    def from_array(pdtype, positions, cdtype=None, colors=None):
        f = Feature()
        p = np.frombuffer(bytes(positions), dtype=pdtype)[0]
        f.positions = {"X": float(p["X"]), "Y": float(p["Y"]),
                       "Z": float(p["Z"])}
        if cdtype is not None and colors is not None:
            c = np.frombuffer(bytes(colors), dtype=cdtype)[0]
            f.colors = {"Red": int(c["Red"]), "Green": int(c["Green"]),
                        "Blue": int(c["Blue"])}
        return f


def _ft_json_bytes(points_length: int, rtc, has_colors: bool,
                   colors_offset: int) -> bytes:
    """The reference's exact FT-JSON serialization
    (feature_table.py:116-121,123-146): insertion-ordered dict, spaces
    stripped, padded to 4 with 1..4 trailing spaces (n%4==0 pads 4)."""
    jsond = {"POINTS_LENGTH": points_length}
    if rtc:
        jsond["RTC_CENTER"] = rtc
    jsond["POSITION"] = {"byteOffset": 0}
    if has_colors:
        jsond["RGB"] = {"byteOffset": colors_offset}
    s = json.dumps(jsond).replace(" ", "")
    n = len(s) + 28
    s += " " * (4 - n % 4)
    return s.encode("utf-8")


class _FeatureTable:
    def __init__(self, positions: np.ndarray, colors, rtc=None):
        self._pos = positions            # (N,3) f32
        self._col = colors               # (N,3) u8 | None
        self.header = SimpleNamespace(points_length=len(positions),
                                      rtc=rtc)

    def feature(self, i: int) -> Feature:
        f = Feature()
        p = self._pos[i]
        f.positions = {"X": np.float32(p[0]), "Y": np.float32(p[1]),
                       "Z": np.float32(p[2])}
        if self._col is not None:
            c = self._col[i]
            f.colors = {"Red": int(c[0]), "Green": int(c[1]),
                        "Blue": int(c[2])}
        return f


class Pnts:
    """Reference pnts.py Pnts: header/body + to_array/from_features."""

    def __init__(self, positions: np.ndarray, colors, rtc=None):
        self.body = SimpleNamespace(
            feature_table=_FeatureTable(positions, colors, rtc=rtc))
        self.header = SimpleNamespace(version=1.0)
        self._sync_header()

    def _sync_header(self):
        ft = self.body.feature_table
        ftj = _ft_json_bytes(ft.header.points_length, ft.header.rtc,
                             ft._col is not None, ft._pos.nbytes)
        ftb = ft._pos.nbytes + (ft._col.nbytes if ft._col is not None else 0)
        h = self.header
        h.ft_json_byte_length = len(ftj)
        h.ft_bin_byte_length = ftb
        h.bt_json_byte_length = 0
        h.bt_bin_byte_length = 0
        h.tile_byte_length = PNTS_HEADER_LEN + len(ftj) + ftb

    @staticmethod
    def from_features(pdtype, cdtype, features):
        pos = np.array([(f.positions["X"], f.positions["Y"],
                         f.positions["Z"]) for f in features],
                       dtype=np.float32)
        col = None
        if cdtype is not None and features and features[0].colors:
            col = np.array([(f.colors["Red"], f.colors["Green"],
                             f.colors["Blue"]) for f in features],
                           dtype=np.uint8)
        return Pnts(pos, col)

    def to_array(self) -> np.ndarray:
        self._sync_header()            # rtc may have been set post-build
        ft = self.body.feature_table
        ftj = _ft_json_bytes(ft.header.points_length, ft.header.rtc,
                             ft._col is not None, ft._pos.nbytes)
        body = ft._pos.astype("<f4").tobytes()
        if ft._col is not None:
            body += ft._col.tobytes()
        header = struct.pack("<4sIIIIII", b"pnts", 1,
                             self.header.tile_byte_length, len(ftj),
                             len(body), 0, 0)
        return np.frombuffer(header + ftj + body, dtype=np.uint8)

    @staticmethod
    def from_array(array) -> "Pnts":
        return _read_pnts(bytes(bytearray(array)))


def _read_pnts(buf: bytes) -> Pnts:
    from py3dtiles_spark.sources.pnts import decode_pnts
    magic, version, total, ftj, ftb, btj, btb = struct.unpack(
        "<4sIIIIII", buf[:PNTS_HEADER_LEN])
    xyz, rgb, ft = decode_pnts(buf, apply_rtc=False)
    t = Pnts(xyz, rgb, rtc=ft.get("RTC_CENTER"))
    # report the FILE's actual header fields, not the re-serialization
    h = t.header
    h.version = float(version)
    h.tile_byte_length = total
    h.ft_json_byte_length = ftj
    h.ft_bin_byte_length = ftb
    h.bt_json_byte_length = btj
    h.bt_bin_byte_length = btb
    return t


class GlTF:
    """Reference gltf.py GlTF facade over gltf_from_arrays/glb_bytes."""

    def __init__(self, glb: bytes):
        self._glb = glb
        json_len = struct.unpack("<I", glb[12:16])[0]
        self.header = json.loads(glb[20:20 + json_len])
        self.body = np.frombuffer(glb[20 + json_len + 8:], dtype=np.uint8)

    @staticmethod
    def from_binary_arrays(arrays, transform, binary=True, batched=True,
                           uri=None, textureUri=None) -> "GlTF":
        return GlTF(gltf_from_arrays(arrays, transform, batched=batched,
                                     texture_uri=textureUri))

    def to_array(self) -> np.ndarray:
        return np.frombuffer(self._glb, dtype=np.uint8)


class B3dm:
    """Reference b3dm.py B3dm facade over b3dm_bytes/parse_b3dm."""

    def __init__(self, buf: bytes):
        self._buf = buf
        d = parse_b3dm(buf)
        self.header = SimpleNamespace(
            version=float(d["version"]),
            tile_byte_length=d["tile_byte_length"],
            ft_json_byte_length=d["ft_json_byte_length"],
            ft_bin_byte_length=d["ft_bin_byte_length"],
            bt_json_byte_length=d["bt_json_byte_length"],
            bt_bin_byte_length=d["bt_bin_byte_length"])
        self.body = SimpleNamespace(
            glTF=SimpleNamespace(header=d["gltf_header"]))

    @staticmethod
    def from_glTF(gltf: GlTF, bt=None) -> "B3dm":
        return B3dm(b3dm_bytes(bytes(gltf.to_array()), bt))

    def to_array(self) -> np.ndarray:
        return np.frombuffer(self._buf, dtype=np.uint8)


class TriangleSoup:
    """Reference wkb_utils.py TriangleSoup over wkb_to_triangles."""

    def __init__(self, tris, data_tris=None):
        self._tris = tris
        self._data = data_tris or []
        self._arrays = None       # cached (positions, normals, bbox)

    def _compute(self):
        # the reference usage pattern calls getPositionArray,
        # getNormalArray and getBbox on one soup — compute the trio once
        if self._arrays is None:
            self._arrays = triangles_to_arrays(self._tris)
        return self._arrays

    @staticmethod
    def from_wkb_multipolygon(wkb, associatedData=()) -> "TriangleSoup":
        if associatedData:
            tris, extras = wkb_to_triangles(bytes(wkb),
                                            associated=[bytes(a) for a
                                                        in associatedData])
            return TriangleSoup(tris, extras)
        return TriangleSoup(wkb_to_triangles(bytes(wkb)))

    def getPositionArray(self) -> bytes:
        return self._compute()[0]

    def getNormalArray(self) -> bytes:
        return self._compute()[1]

    def getDataArray(self, index: int) -> bytes:
        return data_triangles_to_array(self._data[index], dim=2)

    def getBbox(self):
        return self._compute()[2]


class TileContentReader:
    """Reference utils.py TileContentReader: sniff magic, decode."""

    @staticmethod
    def read_file(path: str):
        with open(path, "rb") as f:
            buf = f.read()
        return TileContentReader.read_array(buf)

    @staticmethod
    def read_array(buf: bytes):
        magic = bytes(buf[:4])
        if magic == b"pnts":
            return _read_pnts(bytes(buf))
        if magic == b"b3dm":
            return B3dm(bytes(buf))
        raise ValueError(f"unknown tile magic {magic!r}")
