"""Media-decode throughput (VERDICT r6 #4): MB/s per format through the
pure-Python/numpy codecs, single-core and through the Arrow
image_features/audio_features kernels at local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line {"decode_mbps": {fmt: {...}}, ...} and is cited in
BENCH.md. Separate from the frozen bench.py by design (bench.py is the
driver's measurement contract and is not edited in an optimization
round)."""

from __future__ import annotations

import json
import os
import struct
import sys
import time

import numpy as np

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _img(w=64, h=64, seed=0):
    rng = np.random.default_rng(seed)
    # smooth gradient + mild noise: representative of photographic data
    # for the entropy coders (pure noise is the worst case for JPEG size,
    # pure flat the best; a gradient sits in between)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255 / w)[..., None] * np.array([1.0, 0.7, 0.4])
            + (yy * 255 / h)[..., None] * np.array([0.2, 0.5, 0.9])) / 2
    img = np.clip(base + rng.normal(0, 8, (h, w, 3)), 0, 255)
    return img.astype(np.uint8)


def _bmp_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += img[y, :, ::-1].tobytes() + b"\x00" * pad
    off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0) + bytes(body))


def _wav_bytes(n=16000, rate=8000):
    t = np.arange(n) / rate
    pcm = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype("<i2")
    data = pcm.tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2,
                                    2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from py3dtiles_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from py3dtiles_spark.operators.multimodal import (
        decode_bmp, decode_gif, decode_png, decode_wav, encode_gif,
        encode_png)

    img = _img()
    payloads = {
        "png": (encode_png(img), decode_png),
        "bmp": (_bmp_bytes(img), decode_bmp),
        # GIF is palettized: posterize to 64 colors for the encoder twin
        "gif": (encode_gif((img >> 6) << 6), decode_gif),
        "jpeg": (encode_jpeg(img, quant=1), decode_jpeg),
        "wav": (_wav_bytes(), decode_wav),
    }
    out: dict = {}
    # single-core decode MB/s (payload bytes / wall); rep counts sized so
    # each format runs >= ~1 s
    reps = {"png": 200, "bmp": 400, "gif": 100, "jpeg": 3, "wav": 400}
    for fmt, (payload, dec) in payloads.items():
        dec(payload)                       # warm
        n = reps[fmt]
        t0 = time.time()
        for _ in range(n):
            dec(payload)
        dt = time.time() - t0
        out[fmt] = {"payload_kb": round(len(payload) / 1024, 1),
                    "single_core_mbps": round(
                        n * len(payload) / 1e6 / dt, 3)}

    # through the Arrow kernel at local[CPUS]: aggregate MB/s
    from pyspark.sql import functions as F  # noqa: F401
    from py3dtiles_spark.operators.multimodal import (audio_features,
                                                      image_features)
    from py3dtiles_spark.session import get_spark
    spark = get_spark("bench-media", cpus=CPUS, shuffle_partitions=2 * CPUS)
    kernel_rows = {"png": 2000, "bmp": 4000, "gif": 1000, "jpeg": 64,
                   "wav": 4000}
    for fmt, (payload, _) in payloads.items():
        n = kernel_rows[fmt]
        rows = [(i, "audio" if fmt == "wav" else "image", bytearray(payload),
                 64, 64) for i in range(n)]
        df = spark.createDataFrame(
            rows, "media_id long, kind string, payload binary, "
                  "width int, height int").repartition(CPUS).persist()
        df.count()
        feats = (audio_features(df) if fmt == "wav"
                 else image_features(df, fake=False))
        feats.write.format("noop").mode("overwrite").save()   # warm
        t0 = time.time()
        feats.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        ok = feats.filter("decode_ok").count() if fmt != "wav" else n
        out[fmt]["kernel_mbps_local"] = round(n * len(payload) / 1e6 / dt, 3)
        out[fmt]["kernel_rows"] = n
        out[fmt]["decode_ok"] = int(ok)
        df.unpersist()
    print(json.dumps({"decode_mbps": out, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
