"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas UDFs.

Design for 100 TB of media:
- the payload is ONE opaque binary column; all filter/join/group logic
  runs on the typed metadata struct next to it, so Catalyst prunes and
  pushes down without ever touching bytes;
- decode / feature-extract / resize / frame-sample are mapInPandas
  stages: Arrow moves the bytes JVM→Python once per batch, numpy does
  the per-asset work, and the operator emits columns, not files;
- real codecs (PIL/ffmpeg) are NOT in this container, so ``_decode``
  is a deterministic fake codec behind a clearly-marked seam
  (``decode_with_real_codec`` raises NotImplementedError). The Spark
  plumbing — schema, batch shape, UDF signatures, partitioning — is
  real and oracle-tested: the fake codec is pure arithmetic in doc_id,
  so DuckDB can recompute every output exactly.

Fake-asset format (deterministic in doc_id, seed-free):
    header  = width:int32 BE | height:int32 BE | n_frames:int32 BE
    payload = bytes[(doc_id*31 + i) % 256 for i in range(n_bytes)]
    width   = 32 + (doc_id % 7) * 16
    height  = 32 + (doc_id % 5) * 16
    n_frames= 1 + (doc_id % 24)            # 1 ⇒ still image
    n_bytes = 10 + (doc_id % 50)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guagua_spark.sources.tables import load_table

HEADER_LEN = 12
FRAME_STEP = 4  # frame-sample stride


def _dims(doc_id: int) -> tuple[int, int, int, int]:
    return (
        32 + (doc_id % 7) * 16,
        32 + (doc_id % 5) * 16,
        1 + (doc_id % 24),
        10 + (doc_id % 50),
    )


def _encode(doc_id: int) -> bytes:
    w, h, nf, nb = _dims(doc_id)
    payload = bytes((doc_id * 31 + i) % 256 for i in range(nb))
    return struct.pack(">iii", w, h, nf) + payload


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count (palette PNGs need PIL)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_decode(data: bytes) -> "np.ndarray":
    """Minimal pure-stdlib PNG decoder: 8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced, all five scanline filters (spec §9 'Filtering').
    zlib-inflates the IDAT stream and unfilters line by line — a REAL
    decode of real PNG bytes, deployed as the no-dependency fallback
    behind decode_with_real_codec (PIL, when installed, handles the
    formats this doesn't: palette, 16-bit, interlaced, JPEG...)."""
    import zlib

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, dims = 8, [], None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0:
                raise NotImplementedError(
                    "stdlib PNG path handles 8-bit non-interlaced only"
                )
            nch = _PNG_CHANNELS.get(ctype)
            if nch is None:
                raise NotImplementedError("palette PNG needs PIL")
            dims = (w, h, nch)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if dims is None:
        raise ValueError("PNG without IHDR")
    w, h, nch = dims
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    i = 0
    for y in range(h):
        f = raw[i]
        line = np.frombuffer(
            raw[i + 1 : i + 1 + stride], dtype=np.uint8
        ).astype(np.int32)
        i += 1 + stride
        if f == 0:
            cur = line
        elif f == 2:  # up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # sub / average / paeth need left context
            cur = line
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0  # left
                b = int(prev[x])  # up
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - nch]) if x >= nch else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        prev = cur
        out[y] = cur
    return out.reshape(h, w, nch)


def decode_with_real_codec(payload: bytes) -> "np.ndarray":
    """REAL media decode → (h, w, channels) uint8 array.

    Tries PIL first (every raster format); without PIL, PNG streams
    decode through the pure-stdlib path above — unit-tested on real
    encoded fixtures across all five scanline filters
    (tests/test_multimodal.py). Anything else raises: an honest seam,
    never a silent fake. The synthetic contract operators keep using
    _decode so driver rows stay engine-independent."""
    try:
        import io

        from PIL import Image  # optional dependency

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        pass
    if payload[:8] == PNG_MAGIC:
        return _png_decode(payload)
    raise NotImplementedError(
        "no codec available for this payload format (install PIL for "
        "JPEG/WEBP/...); PNG decodes via the built-in stdlib path"
    )


def decode_image_batch(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas over a binary image column using the REAL codec:
    (id, height, width, channels, mean_value) per image. Same batch
    shape / partitioning contract as the synthetic decode operators —
    this is the deployment path for actual image corpora."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            arrs = [decode_with_real_codec(m) for m in b[media_col]]
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "height": [a.shape[0] for a in arrs],
                    "width": [a.shape[1] for a in arrs],
                    "channels": [
                        (a.shape[2] if a.ndim == 3 else 1) for a in arrs
                    ],
                    "mean_value": [float(a.mean()) for a in arrs],
                }
            )

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, height int, width int, channels int, "
        "mean_value double",
    )


def decode_audio_with_real_codec(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """REAL audio decode → (sample_rate, n_channels, samples[n, ch])
    via the pure-stdlib ``wave`` module: PCM WAV (8/16/32-bit int)
    needs no external codec, exactly like the stdlib PNG path for
    images. Anything else (MP3/FLAC/OGG need a codec lib) raises —
    the same honest-seam contract as decode_with_real_codec."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "no codec available for this audio format (PCM WAV decodes "
            "via the built-in stdlib path; MP3/FLAC/... need a codec lib)"
        )
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4").astype(np.int64)
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    return rate, nch, samples.reshape(-1, nch)


def audio_features_batch(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas over a binary audio column using the REAL codec:
    (id, sample_rate, n_channels, n_samples, duration_s, rms,
    zero_cross_rate) per clip — the standard cheap audio-quality
    feature set (silence/clipping screens key off rms; zcr separates
    tonal from noisy content). Same batch-shape contract as the image
    twin; deployment path for actual audio corpora."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, list] = {
                id_col: [], "sample_rate": [], "n_channels": [],
                "n_samples": [], "duration_s": [], "rms": [],
                "zero_cross_rate": [],
            }
            for i, m in zip(b[id_col], b[media_col]):
                rate, nch, s = decode_audio_with_real_codec(bytes(m))
                mono = s.mean(axis=1)
                n = len(mono)
                zc = (
                    float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    / max(n - 1, 1)
                )
                rows[id_col].append(i)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(nch)
                rows["n_samples"].append(n)
                rows["duration_s"].append(round(n / rate, 6))
                rows["rms"].append(
                    round(float(np.sqrt(np.mean(mono**2))), 6) if n else 0.0
                )
                rows["zero_cross_rate"].append(round(zc, 6))
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, sample_rate int, n_channels int, "
        "n_samples long, duration_s double, rms double, "
        "zero_cross_rate double",
    )


def sample_frames_with_real_codec(
    payload: bytes, every_n: int = 4
) -> "list[np.ndarray]":
    """REAL video frame sampling seam: pipe the container bytes through
    an ``ffmpeg`` binary (``select=not(mod(n,N))`` → PNG image2pipe),
    decode each emitted PNG with decode_with_real_codec, and return the
    sampled frames as (h, w, ch) arrays. Raises when no ffmpeg is on
    PATH — an honest seam, never a silent fake (this container ships no
    media libs; the synthetic contract operators keep using _decode).
    PNG as the inter-process frame format so the pipeline needs ffmpeg
    only for the CONTAINER/codec step — frame bytes come back through
    the same real image path the image operators use."""
    import shutil
    import subprocess

    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise NotImplementedError(
            "real video frame sampling needs an ffmpeg binary on PATH "
            "(images decode via decode_with_real_codec without it)"
        )
    proc = subprocess.run(
        [
            ffmpeg, "-v", "error", "-i", "pipe:0",
            "-vf", f"select=not(mod(n\\,{every_n}))", "-fps_mode", "vfr",
            "-f", "image2pipe", "-vcodec", "png", "pipe:1",
        ],
        input=payload,
        stdout=subprocess.PIPE,
        check=True,
    )
    return [
        decode_with_real_codec(png) for png in _split_png_stream(proc.stdout)
    ]


def _split_png_stream(out: bytes) -> "list[bytes]":
    """Split a concatenation of PNG files by WALKING CHUNKS to each
    frame's IEND — scanning for the next 8-byte signature would split
    mid-frame if the magic bytes ever occur inside a chunk's payload
    (compressed IDAT data, text chunks: unlikely per frame, not across
    a large corpus)."""
    frames, pos = [], 0
    while pos + 8 <= len(out):
        if out[pos : pos + 8] != PNG_MAGIC:
            raise ValueError(
                f"unexpected bytes at offset {pos} of the PNG stream"
            )
        end = pos + 8
        closed = False
        while end + 8 <= len(out):
            (ln,) = struct.unpack(">I", out[end : end + 4])
            typ = out[end + 4 : end + 8]
            end += 12 + ln  # len + type + data + crc
            if typ == b"IEND":
                closed = True
                break
        if not closed or end > len(out):
            # a truncated encoder stream (killed ffmpeg, broken pipe)
            # must fail HERE, not surface later as a confusing decode
            # error on a half-frame — or worse, a silently wrong frame
            raise ValueError(
                f"PNG stream truncated: frame starting at offset {pos} "
                "ended before its IEND chunk"
            )
        frames.append(out[pos:end])
        pos = end
    if pos != len(out):
        raise ValueError(
            f"PNG stream has {len(out) - pos} trailing bytes after the "
            "last complete frame"
        )
    return frames


def frame_sample_batch(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every_n: int = 4,
) -> DataFrame:
    """Deployment twin of multimodal_frame_sample for REAL video bytes:
    one output row per sampled frame (id, frame_idx, h, w, channels) —
    the same mapInPandas fan-out shape as the synthetic contract
    operator, with ffmpeg doing the demux/decode per batch row. Skew
    note: a long video fans out many rows inside ONE task, like the
    giant-doc chunking case — repartition downstream if frames feed
    per-frame heavy work."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, list] = {
                id_col: [], "frame_idx": [],
                "height": [], "width": [], "channels": [],
            }
            for i, m in zip(b[id_col], b[media_col]):
                frames = sample_frames_with_real_codec(bytes(m), every_n)
                for fi, arr in enumerate(frames):
                    rows[id_col].append(i)
                    rows["frame_idx"].append(fi * every_n)
                    rows["height"].append(arr.shape[0])
                    rows["width"].append(arr.shape[1])
                    rows["channels"].append(
                        arr.shape[2] if arr.ndim == 3 else 1
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, frame_idx int, height int, width int, "
        "channels int",
    )


def _decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    w, h, nf = struct.unpack(">iii", payload[:HEADER_LEN])
    return w, h, nf, np.frombuffer(payload[HEADER_LEN:], dtype=np.uint8)


#: session memo of the synthetic asset table per sf_dir, persisted —
#: a real pipeline READS stored media bytes; re-synthesizing them per
#: query measured an extra Python encode stage in all four multimodal
#: contract rows. Same contract as the other session memos: keyed on
#: the documents fingerprint, ONE live entry total (caching a new
#: sf_dir evicts + unpersists every other), clear_caches() unpins,
#: first build visible in the bench cold lane.
_ASSET_CACHE: dict = {}


def clear_caches() -> None:
    """Unpersist and drop the asset memo (data-regen hook)."""
    from guagua_spark.memo import unpersist_all

    unpersist_all(_ASSET_CACHE)


def media_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media binary, meta struct). The binary is
    built in an Arrow-batched UDF (distributed, never on the driver)
    once per (sf_dir, table fingerprint) and persisted — downstream
    decode/feature/resize operators read the stored bytes, like a real
    pipeline reads an object store."""
    from guagua_spark.memo import persisted_index
    from guagua_spark.sources.tables import table_fingerprint

    def build() -> DataFrame:
        # repartition before the encode/decode UDF chain: a small
        # parquet file scans as ONE partition and projections (incl.
        # pandas UDFs) run below the exchange — without this every
        # multimodal operator runs its Python stage serially
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id")
            .repartition(spark.sparkContext.defaultParallelism)
        )

        @F.pandas_udf("binary")
        def encode(ids: pd.Series) -> pd.Series:
            return ids.map(lambda i: _encode(int(i)))

        kind = F.when(F.col("doc_id") % 24 == 0, "image").otherwise("video")
        return docs.select(
            "doc_id",
            encode("doc_id").alias("media"),
            F.struct(
                kind.alias("kind"),
                (F.lit(32) + (F.col("doc_id") % 7) * 16).alias("width"),
                (F.lit(32) + (F.col("doc_id") % 5) * 16).alias("height"),
            ).alias("meta"),
        )

    return persisted_index(
        _ASSET_CACHE,
        sf_dir,
        table_fingerprint(sf_dir, "documents"),
        "media_assets",
        build,
    )


def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode headers from the binary payloads (mapInPandas) — verifies
    bytes round-trip through Arrow and the metadata matches the column
    copy that rode alongside."""
    assets = media_assets(spark, sf_dir)

    def decode_batches(
        it: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_decode(m) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "n_frames": [r[2] for r in rows],
                    "n_bytes": [len(r[3]) for r in rows],
                }
            )

    return assets.mapInPandas(
        decode_batches,
        "doc_id long, width int, height int, n_frames int, n_bytes int",
    ).orderBy("doc_id")


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset payload statistics (the 'feature extraction' stage):
    mean/min/max byte value — numpy over Arrow batches."""
    assets = media_assets(spark, sf_dir)

    def feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "mean_b": [], "min_b": [], "max_b": []}
            for m in pdf["media"]:
                _, _, _, px = _decode(m)
                out["mean_b"].append(round(float(px.mean()), 6))
                out["min_b"].append(int(px.min()))
                out["max_b"].append(int(px.max()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        feat, "doc_id long, mean_b double, min_b int, max_b int"
    ).orderBy("doc_id")


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every FRAME_STEP-th frame index per asset
    with n_frames > 1 — one output row per sampled frame (the UDTF-ish
    shape: mapInPandas is free to emit more rows than it consumes)."""
    assets = media_assets(spark, sf_dir).filter(F.col("meta.kind") == "video")

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames = [], []
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                _, _, nf, _ = _decode(m)
                for fi in range(0, nf, FRAME_STEP):
                    ids.append(doc_id)
                    frames.append(fi)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": frames})

    return assets.mapInPandas(
        sample, "doc_id long, frame_idx int"
    ).orderBy("doc_id", "frame_idx")


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' each asset to 8×8 by nearest-neighbor sampling the
    payload (stand-in for a real image resample — same batch shape);
    emits the new dims + a checksum of sampled bytes.

    Sample positions use exact integer arithmetic — j·(n−1) // 63 for
    j in 0..63 — rather than float linspace, so the positions (and the
    DuckDB oracle) are reproducible with no float-rounding hazard."""
    assets = media_assets(spark, sf_dir)
    target = 8

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        steps = np.arange(target * target, dtype=np.int64)
        for pdf in it:
            sums = []
            for m in pdf["media"]:
                _, _, _, px = _decode(m)
                idx = steps * (len(px) - 1) // (target * target - 1)
                sums.append(int(px[idx].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target,
                    "height": target,
                    "checksum": sums,
                }
            )

    return assets.mapInPandas(
        resize, "doc_id long, width int, height int, checksum long"
    ).orderBy("doc_id")


# -- oracle SQL (the fake codec is pure arithmetic in doc_id) ----------------

_PAYLOAD = "list_transform(range(0, 10 + doc_id % 50), i -> (doc_id*31 + i) % 256)"

ORACLE_SQL = {
    "multimodal_decode_meta": """
SELECT doc_id,
       CAST(32 + (doc_id % 7) * 16 AS INT) AS width,
       CAST(32 + (doc_id % 5) * 16 AS INT) AS height,
       CAST(1 + (doc_id % 24) AS INT) AS n_frames,
       CAST(10 + (doc_id % 50) AS INT) AS n_bytes
FROM documents ORDER BY doc_id
""".strip(),
    "multimodal_features": f"""
SELECT doc_id,
       ROUND(list_avg({_PAYLOAD}), 6) AS mean_b,
       CAST(list_min({_PAYLOAD}) AS INT) AS min_b,
       CAST(list_max({_PAYLOAD}) AS INT) AS max_b
FROM documents ORDER BY doc_id
""".strip(),
    "multimodal_frame_sample": f"""
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx
FROM documents,
     UNNEST(range(0, 1 + doc_id % 24, {FRAME_STEP})) AS t(frame_idx)
WHERE doc_id % 24 <> 0
ORDER BY doc_id, frame_idx
""".strip(),
    "multimodal_resize": f"""
WITH p AS (
  SELECT doc_id, {_PAYLOAD} AS pl, 10 + doc_id % 50 AS nb FROM documents
)
SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       CAST(list_sum(list_transform(range(0, 64),
            j -> pl[CAST(j * (nb - 1) // 63 AS INT) + 1])) AS BIGINT)
         AS checksum
FROM p ORDER BY doc_id
""".strip(),
}

QUERIES = {
    "multimodal_decode_meta": multimodal_decode_meta,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
}


# -- sf100 sampled twin (round 11) ------------------------------------------


def multimodal_frame_sample_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """multimodal_frame_sample over the md5 doc subset — per-asset
    computation, so the subset twin is exact; keeps the ~17M-row sf100
    output at row-hash-comparable scale."""
    from guagua_spark.functions.scale import u32_hash
    from guagua_spark.operators.dedup import DOC_SAMPLE_TARGET

    assets_all = media_assets(spark, sf_dir)
    n = assets_all.count()
    rate = min(1.0, DOC_SAMPLE_TARGET / max(n, 1))
    assets = assets_all.filter(
        (F.col("meta.kind") == "video")
        & (
            u32_hash("docsamp", F.col("doc_id").cast("string"))
            < F.lit(rate * 4294967296.0)
        )
    )

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames = [], []
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                _, _, nf, _ = _decode(m)
                for fi in range(0, nf, FRAME_STEP):
                    ids.append(doc_id)
                    frames.append(fi)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": frames})

    return assets.mapInPandas(
        sample, "doc_id long, frame_idx int"
    ).orderBy("doc_id", "frame_idx")


def _frame_sample_oracle_sampled() -> str:
    from guagua_spark.operators.dedup import DOC_SAMPLE_TARGET

    keep = (
        "CAST(('0x' || substr(md5('docsamp|' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT) < drate.rate * 4294967296.0"
    )
    return f"""
WITH drate AS (
  SELECT LEAST(1.0, {float(DOC_SAMPLE_TARGET)!r}
               / GREATEST(COUNT(*), 1)) AS rate
  FROM documents
),
dsamp AS (SELECT doc_id FROM documents, drate WHERE {keep})
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx
FROM dsamp,
     UNNEST(range(0, 1 + doc_id % 24, {FRAME_STEP})) AS t(frame_idx)
WHERE doc_id % 24 <> 0
ORDER BY doc_id, frame_idx
""".strip()


SWEEP_SAMPLED = {
    "multimodal_frame_sample": (
        multimodal_frame_sample_sampled,
        _frame_sample_oracle_sampled(),
        "u32(md5('docsamp|doc_id')) < min(1, 50000/n_docs)*2^32",
    ),
}
