"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition-preserving batch
transforms, Arrow batch shapes — is real and tested. Since r8 the
image decode itself is REAL for every library-free format (netpbm
P2/P3/P5/P6, uncompressed BMP — numpy-only codecs in
:mod:`mpes_spark.io.images`), and :func:`resize_images_decoded` runs
a true decode -> nearest-neighbor resample -> re-encode per Arrow
batch. Since r9 PNG, TIFF (none/LZW/PackBits), baseline JPEG and FLAC
decode natively too (io/images.py, io/jpeg.py, io/flac.py — JPEG
baseline AND progressive SOF2) — every image format the reference met
through skimage, plus WAV/FLAC audio and DIB-AVI video. Only lossy
MP3/OGG/H264-class formats and the lossless-JPEG/arithmetic variants
remain env-gated behind ``NotImplementedError``;
swapping in PIL/ffmpeg for those is a one-function change and the
distributed plan is unchanged.

Data model: one row per asset,
    (asset_id bigint, modality string, payload binary,
     meta struct<width:int, height:int, sample_rate:int, n_frames:int>)

Scale notes (100 TB): payloads stay columnar in parquet (binary
column); transforms run as ``mapInPandas`` over Arrow record batches
so each Python worker sees a bounded batch (spark.sql.execution.arrow
.maxRecordsPerBatch), never a whole partition; metadata-only queries
(counts, byte sizes, dimension stats) never touch ``payload`` thanks
to parquet column pruning — verify with .explain(): ReadSchema should
exclude payload for such queries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of the feature rows produced by :func:`extract_features`
FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, checksum bigint, "
    "feat array<double>"
)

ASSET_SCHEMA = (
    "asset_id bigint, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def assets_from_documents(df: DataFrame, modality: str = "image") -> DataFrame:
    """Build a deterministic multimodal asset table from the documents
    relation (utf-8 payload stands in for encoded media bytes; metadata
    derived from content length). Used by tests and the registry so the
    plumbing is exercised without binary fixtures."""
    return df.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.length("text") % 640).cast("int").alias("width"),
            (F.length("text") % 480).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.length("text") % 90).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Decode image bytes to a numpy array. REAL for every
    library-free format — netpbm P2/P3/P5/P6 (incl. 16-bit),
    uncompressed BMP (8-bit palette / 24-bit), PNG, TIFF
    (none/LZW/PackBits + predictor 2) and baseline JPEG via the
    numpy-only codecs in :mod:`mpes_spark.io.images` and
    :mod:`mpes_spark.io.jpeg` (baseline and progressive SOF2) — the
    image seam is closed; only lossless SOF3/arithmetic raise."""
    from mpes_spark.io.images import decode_image_bytes

    return decode_image_bytes(payload)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: byte-histogram moments.
    Pure Python/arith on bytes — stable across runs and engines."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, byt in enumerate(payload):
        acc[i % dim] += byt
    n = len(payload)
    return [round(a / n, 6) for a in acc]


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction over Arrow batches (``mapInPandas``): real
    batch plumbing, fake feature math (see :func:`_fake_feature`; a
    real pipeline swaps in a decode + model forward per batch).
    Partition-preserving — no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: sum(b) % (1 << 31)
                    ).astype("int64"),
                    "feat": payloads.map(lambda b: _fake_feature(b, dim)),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def byte_accumulators(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Integer-exact projection of the feature-extraction plumbing for
    cross-engine gating: per asset the positional byte-sum
    accumulators ``acc_j = sum of payload bytes at positions ≡ j
    (mod dim)`` plus n_bytes and checksum — ALL integers, so the
    oracle hash gate is exact with zero rounding (the all-integer
    playbook label_propagation uses). :func:`extract_features`'s
    float features are exactly ``round(acc_j / n, 6)`` — the tie is
    asserted in tests/test_extras.py. Same ``mapInPandas`` Arrow
    batch shape as the float path; partition-preserving."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            out = {
                "asset_id": pdf["asset_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(
                    lambda b: sum(b) % (1 << 31)
                ).astype("int64"),
            }
            for j in range(dim):
                out[f"acc{j}"] = payloads.map(
                    lambda b, j=j: sum(b[j::dim])
                ).astype("int64")
            yield pd.DataFrame(out)

    schema = "asset_id bigint, n_bytes bigint, checksum bigint, " + ", ".join(
        f"acc{j} bigint" for j in range(dim)
    )
    return assets.mapInPandas(batches, schema=schema)


def byte_accumulators_sql(table: str, dim: int = 8, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`byte_accumulators` over the
    documents-derived asset table (payload = utf-8 text, which the
    test data guarantees is pure ASCII, so byte i = ascii(char i)):
    one char explode via the unnest/generate_subscripts zip, then an
    integer conditional-sum rollup per asset."""
    accs = ", ".join(
        f"CAST(sum(CASE WHEN i % {dim} = {j} THEN byte ELSE 0 END) AS BIGINT)"
        f" AS acc{j}"
        for j in range(dim)
    )
    return f"""
WITH chars AS (
  SELECT {id_col} AS asset_id,
         generate_subscripts(cs, 1) - 1 AS i,
         ascii(unnest(cs)) AS byte
  FROM (SELECT {id_col}, string_split(text, '') AS cs FROM {table}) t
)
SELECT asset_id,
       CAST(count(*) AS BIGINT) AS n_bytes,
       CAST(sum(byte) % 2147483648 AS BIGINT) AS checksum,
       {accs}
FROM chars GROUP BY asset_id
""".strip()


def frame_manifest_sql(
    table: str, every_n: int = 10, frames_mod: int = 90, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of the :func:`sample_frames` manifest over the
    documents-derived asset table (n_frames = length(text) %
    ``frames_mod``, matching :func:`assets_from_documents`)."""
    return f"""
SELECT {id_col} AS asset_id,
       CAST(unnest(range(0, length(text) % {frames_mod}, {every_n})) AS BIGINT)
         AS frame_idx
FROM {table}
WHERE length(text) % {frames_mod} > 0
""".strip()


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Image-resize plumbing over Arrow batches (``mapInPandas``):
    emits the asset rows with resized payloads and updated metadata.
    The pixel resample itself is STUBBED deterministically (payload
    re-hashed to the target byte budget — no imaging library in this
    runtime); a real implementation decodes with
    :func:`decode_image`, resamples, and re-encodes per batch — the
    schema, batch shape, and partition-preserving plan are already
    exactly what that implementation needs."""
    target_bytes = width * height * 3  # fake RGB byte budget

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            # deterministic fake resample: tile/truncate payload bytes
            out["payload"] = out["payload"].map(
                lambda b: (bytes(b) * (target_bytes // max(len(b), 1) + 1))[
                    :target_bytes
                ]
            )
            out["meta"] = out["meta"].map(
                lambda m: {
                    "width": width,
                    "height": height,
                    "sample_rate": m["sample_rate"],
                    "n_frames": m["n_frames"],
                }
            )
            yield out

    return assets.mapInPandas(batches, schema=ASSET_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (the decode itself is stubbed — a real impl reads the
    container per batch). Explode is JVM-side; the payload column is
    carried by reference in the Tungsten row, not copied per frame."""
    return assets.filter(F.col("meta.n_frames") > 0).select(
        "asset_id",
        "modality",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        F.col("payload"),
    )


def modality_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only rollup: per modality, asset count / total bytes /
    mean width. Reads only (modality, payload-length, meta) — with a
    length column materialized at write time this becomes a
    payload-free scan."""
    return assets.groupBy("modality").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
        F.round(F.avg(F.col("meta.width")), 6).alias("avg_width"),
    )


def resize_images_decoded(
    assets: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """REAL image resize for natively-decodable payloads (r8): decode
    (PNM/BMP via the numpy-only codecs), nearest-neighbor resample,
    re-encode as binary PNM — per Arrow batch over ``mapInPandas``,
    partition-preserving, no shuffle. This is the production shape
    :func:`resize_images` documents. Every supported format decodes
    natively (PNM/BMP/PNG/TIFF/baseline JPEG); malformed payloads
    raise rather than passing through silently wrong."""
    from mpes_spark.io.images import (
        decode_image_bytes,
        resample_nearest,
        write_pnm,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda b: write_pnm(
                    resample_nearest(decode_image_bytes(bytes(b)), width, height)
                )
            )
            out["meta"] = out["meta"].map(
                lambda m: {
                    "width": width,
                    "height": height,
                    "sample_rate": m["sample_rate"],
                    "n_frames": m["n_frames"],
                }
            )
            yield out

    return assets.mapInPandas(batches, schema=ASSET_SCHEMA)


def _spread(docs: DataFrame, id_col: str) -> DataFrame:
    """Spread a tiny-by-bytes but CPU-heavy-per-row relation across an
    EXPLICIT defaultParallelism partition count before a Python codec
    stage. Advisory repartition does not work here: AQE sizes shuffles
    by bytes and coalesces a few-MB doc relation straight back to one
    task (measured: jpeg_decode_stats 9.4 s on 1 task -> 1.9 s on 8;
    flac_decode_stats 12.6 s -> see SCALING.md). Join-free path, so
    the `_docs` AQE broadcast-demotion concern does not apply."""
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select(id_col, "text").repartition(n_part, F.col(id_col))


def _ascii_payload(text: str, max_bytes: int) -> bytes:
    """Dialect-identical synthetic codec payload: drop non-ASCII
    characters BEFORE the byte slice, so the utf-8 bytes equal the
    codepoints the DuckDB twin reads with ascii() for ANY input —
    multibyte truncation cannot split the two engines (ADVICE r9).
    The committed fixtures are pure ASCII, so this is a no-op there."""
    return text.encode("ascii", "ignore")[:max_bytes]


# The matching DuckDB-side projection (RE2 class; standard SQL literals
# pass the backslashes through to the regex engine untouched).
_ASCII_TEXT_SQL = r"regexp_replace(text, '[^\x00-\x7F]', '', 'g')"


def image_decode_stats(
    docs: DataFrame, width: int = 16, max_bytes: int = 128, id_col: str = "doc_id"
) -> DataFrame:
    """Hash-gated exercise of the REAL image codec path (r8): each
    document's leading utf-8 bytes become a grayscale image (row width
    ``width``, zero-padded to a full last row), ENCODED to binary PGM
    and DECODED back via the numpy codecs inside one Arrow batch, then
    reduced to integer pixel statistics. Because the synthetic image
    is a deterministic function of the text, a DuckDB twin
    (:func:`image_decode_stats_sql`) can compute the same statistics
    straight from the characters — so the driver's hash gate verifies
    the full encode -> decode -> aggregate round-trip, not a fake.
    All-integer output: exact gate. mapInPandas, partition-preserving,
    payload never leaves the batch."""
    import numpy as np

    from mpes_spark.io.images import read_pnm, write_pnm

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, npix, sums, mx = [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:  # empty doc: no image, stats are zeros
                    npix.append(0), sums.append(0), mx.append(0)
                    continue
                pad = (-len(raw)) % width
                buf = np.frombuffer(raw + b"\x00" * pad, dtype="u1")
                img = buf.reshape(-1, width)
                decoded = read_pnm(write_pnm(img))  # the real round-trip
                npix.append(int(decoded.size))
                sums.append(int(decoded.astype("int64").sum()))
                mx.append(int(decoded.max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_pixels": pd.Series(npix, dtype="int64"),
                    "sum_pixels": pd.Series(sums, dtype="int64"),
                    "max_pixel": pd.Series(mx, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_pixels bigint, sum_pixels bigint, "
        "max_pixel bigint",
    )


def image_decode_stats_sql(
    table: str, width: int = 16, max_bytes: int = 128, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`image_decode_stats`: the synthetic image
    is the first ``max_bytes`` utf-8 bytes of the (ASCII, per the test
    fixtures) text zero-padded to a multiple of ``width``, so pixel
    stats are character stats plus the padding arithmetic. Empty-text
    docs keep a row of zeros (LEFT JOIN), matching the Spark guard."""
    return f"""
WITH chars AS (
  SELECT {id_col}, ascii(unnest(string_split(atext[1:{max_bytes}], ''))) AS byte
  FROM (SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}) p
  WHERE length(atext) > 0
),
agg AS (
  SELECT {id_col}, count(*) AS n_raw, sum(byte) AS s, max(byte) AS m
  FROM chars GROUP BY {id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(n_raw + ((-n_raw) % {width} + {width}) % {width}, 0) AS BIGINT) AS n_pixels,
       CAST(COALESCE(s, 0) AS BIGINT) AS sum_pixels,
       CAST(COALESCE(CASE WHEN ((-n_raw) % {width} + {width}) % {width} > 0
                 THEN greatest(m, 0) ELSE m END, 0) AS BIGINT) AS max_pixel
FROM {table} d LEFT JOIN agg USING ({id_col})
""".strip()


def png_decode_stats(
    docs: DataFrame, width: int = 8, max_bytes: int = 120, id_col: str = "doc_id"
) -> DataFrame:
    """The REAL PNG codec under the hash gate (r9, VERDICT #4 — the
    format users actually have): each doc's leading utf-8 bytes become
    an RGB image (``width`` pixels per row, zero-padded to a full last
    row of width*3 samples), ENCODED to a zlib-compressed PNG and
    DECODED back through the stdlib-zlib + numpy-unfilter path inside
    one Arrow batch, then reduced to integer pixel statistics plus the
    round-tripped row count. The oracle re-derives the stats from the
    characters, so a hash match proves PNG encode -> inflate ->
    unfilter -> aggregate lossless. All-integer output: exact gate."""
    import numpy as np

    from mpes_spark.io.images import read_png, write_png

    chunk = width * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nrows, npix, sums, mx = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:  # empty doc: no image, stats are zeros
                    nrows.append(0), npix.append(0)
                    sums.append(0), mx.append(0)
                    continue
                pad = (-len(raw)) % chunk
                buf = np.frombuffer(raw + b"\x00" * pad, dtype="u1")
                img = buf.reshape(-1, width, 3)
                decoded = read_png(write_png(img))  # the real round-trip
                nrows.append(int(decoded.shape[0]))
                npix.append(int(decoded.size))
                sums.append(int(decoded.astype("int64").sum()))
                mx.append(int(decoded.max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_rows": pd.Series(nrows, dtype="int64"),
                    "n_pixels": pd.Series(npix, dtype="int64"),
                    "sum_pixels": pd.Series(sums, dtype="int64"),
                    "max_pixel": pd.Series(mx, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_rows bigint, n_pixels bigint, "
        "sum_pixels bigint, max_pixel bigint",
    )


def png_decode_stats_sql(
    table: str, width: int = 8, max_bytes: int = 120, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`png_decode_stats`: the synthetic RGB
    image is the leading ``max_bytes`` (ASCII) bytes zero-padded to a
    multiple of ``width * 3`` samples, so pixel stats are character
    stats plus padding arithmetic; empty-text docs keep zero rows."""
    chunk = width * 3
    return f"""
WITH chars AS (
  SELECT {id_col}, ascii(unnest(string_split(atext[1:{max_bytes}], ''))) AS byte
  FROM (SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}) p
  WHERE length(atext) > 0
),
agg AS (
  SELECT {id_col}, count(*) AS n_raw, sum(byte) AS s, max(byte) AS m
  FROM chars GROUP BY {id_col}
),
pads AS (
  SELECT {id_col}, n_raw, s, m,
         n_raw + ((-n_raw) % {chunk} + {chunk}) % {chunk} AS n_padded
  FROM agg
)
SELECT d.{id_col},
       CAST(COALESCE(n_padded // {chunk}, 0) AS BIGINT) AS n_rows,
       CAST(COALESCE(n_padded, 0) AS BIGINT) AS n_pixels,
       CAST(COALESCE(s, 0) AS BIGINT) AS sum_pixels,
       CAST(COALESCE(CASE WHEN n_padded > n_raw THEN greatest(m, 0) ELSE m END, 0)
            AS BIGINT) AS max_pixel
FROM {table} d LEFT JOIN pads USING ({id_col})
""".strip()


def tiff_decode_stats(
    docs: DataFrame, width: int = 10, max_bytes: int = 120, id_col: str = "doc_id"
) -> DataFrame:
    """The REAL TIFF/LZW codec under the hash gate (r9 late — closes
    the lossless half of the last image seam): each doc's leading
    utf-8 bytes become a grayscale image (``width`` pixels per row,
    zero-padded to a full last row), ENCODED to an LZW-compressed
    TIFF with horizontal predictor 2 (the real-world pairing) and
    DECODED back through the numpy TIFF6 path — IFD parse, strip
    reassembly, early-change LZW inflate, predictor undo — inside one
    Arrow batch, then reduced to integer pixel statistics plus the
    round-tripped row count. The oracle re-derives the stats from the
    characters, so a hash match proves the full compressed round-trip
    lossless. All-integer output: exact gate."""
    import numpy as np

    from mpes_spark.io.images import read_tiff, write_tiff

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nrows, npix, sums, mx = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:  # empty doc: no image, stats are zeros
                    nrows.append(0), npix.append(0)
                    sums.append(0), mx.append(0)
                    continue
                pad = (-len(raw)) % width
                buf = np.frombuffer(raw + b"\x00" * pad, dtype="u1")
                img = buf.reshape(-1, width)
                decoded = read_tiff(  # the real compressed round-trip
                    write_tiff(img, compression="lzw", predictor=2)
                )
                nrows.append(int(decoded.shape[0]))
                npix.append(int(decoded.size))
                sums.append(int(decoded.astype("int64").sum()))
                mx.append(int(decoded.max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_rows": pd.Series(nrows, dtype="int64"),
                    "n_pixels": pd.Series(npix, dtype="int64"),
                    "sum_pixels": pd.Series(sums, dtype="int64"),
                    "max_pixel": pd.Series(mx, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_rows bigint, n_pixels bigint, "
        "sum_pixels bigint, max_pixel bigint",
    )


def tiff_decode_stats_sql(
    table: str, width: int = 10, max_bytes: int = 120, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`tiff_decode_stats`: the synthetic gray
    image is the leading ``max_bytes`` (ASCII) bytes zero-padded to a
    multiple of ``width``, so pixel stats are character stats plus
    padding arithmetic; empty-text docs keep zero rows."""
    return f"""
WITH chars AS (
  SELECT {id_col}, ascii(unnest(string_split(atext[1:{max_bytes}], ''))) AS byte
  FROM (SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}) p
  WHERE length(atext) > 0
),
agg AS (
  SELECT {id_col}, count(*) AS n_raw, sum(byte) AS s, max(byte) AS m
  FROM chars GROUP BY {id_col}
),
pads AS (
  SELECT {id_col}, n_raw, s, m,
         n_raw + ((-n_raw) % {width} + {width}) % {width} AS n_padded
  FROM agg
)
SELECT d.{id_col},
       CAST(COALESCE(n_padded // {width}, 0) AS BIGINT) AS n_rows,
       CAST(COALESCE(n_padded, 0) AS BIGINT) AS n_pixels,
       CAST(COALESCE(s, 0) AS BIGINT) AS sum_pixels,
       CAST(COALESCE(CASE WHEN n_padded > n_raw THEN greatest(m, 0) ELSE m END, 0)
            AS BIGINT) AS max_pixel
FROM {table} d LEFT JOIN pads USING ({id_col})
""".strip()


def audio_decode_stats(
    docs: DataFrame, rate: int = 16_000, max_bytes: int = 128, id_col: str = "doc_id"
) -> DataFrame:
    """The REAL audio codec under the hash gate (r8, the WAV twin of
    :func:`image_decode_stats`): each doc's leading bytes become int16
    PCM samples, ENCODED to RIFF/WAVE and DECODED back via the
    numpy-only codec inside one Arrow batch, then reduced to integer
    sample statistics + the round-tripped sample rate. The oracle
    re-derives the stats from the characters, so a hash match proves
    the encode -> decode round-trip lossless."""
    import numpy as np

    from mpes_spark.io.audio import decode_audio_bytes, write_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ns, sums, mx, rates = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:  # empty doc: zero-length PCM, stats zeros
                    ns.append(0), sums.append(0), mx.append(0)
                    rates.append(rate)
                    continue
                samples = np.frombuffer(raw, dtype="u1").astype(np.int16)
                decoded, got_rate = decode_audio_bytes(write_wav(samples, rate))
                ns.append(int(decoded.size))
                sums.append(int(decoded.astype("int64").sum()))
                mx.append(int(decoded.max()))
                rates.append(int(got_rate))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_samples": pd.Series(sums, dtype="int64"),
                    "max_sample": pd.Series(mx, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_samples bigint, sum_samples bigint, "
        "max_sample bigint, sample_rate bigint",
    )


def audio_decode_stats_sql(
    table: str, rate: int = 16_000, max_bytes: int = 128, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`audio_decode_stats` (pure-ASCII fixtures:
    sample i = ascii(char i) of the leading ``max_bytes`` chars).
    Empty-text docs keep a row of zeros, matching the Spark guard."""
    return f"""
WITH agg AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_samples,
         CAST(sum(byte) AS BIGINT) AS sum_samples,
         CAST(max(byte) AS BIGINT) AS max_sample
  FROM (
    SELECT {id_col}, ascii(unnest(string_split(atext[1:{max_bytes}], ''))) AS byte
    FROM (SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}) p
    WHERE length(atext) > 0
  ) GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(n_samples, 0) AS n_samples,
       COALESCE(sum_samples, 0) AS sum_samples,
       COALESCE(max_sample, 0) AS max_sample,
       CAST({rate} AS BIGINT) AS sample_rate
FROM {table} d LEFT JOIN agg USING ({id_col})
""".strip()


def jpeg_decode_stats(
    docs: DataFrame, width: int = 6, max_bytes: int = 48, id_col: str = "doc_id"
) -> DataFrame:
    """The REAL baseline-JPEG codec under the hash gate (r9 late —
    the format is lossy, but the constant-block content class is
    provably lossless at quality 100: each 8x8 block is DC-only with
    exactly representable coefficients, so rounding margins are
    ~1e-13, far from the 0.5 flip distance). Each doc's leading bytes
    become an image of 8x8 CONSTANT tiles (``width`` tiles per row,
    zero-padded), ENCODED to baseline JPEG (Huffman entropy coding,
    byte stuffing, DC prediction, zigzag, quant, DCT) and DECODED
    back inside one Arrow batch, then reduced to integer pixel stats.
    The oracle re-derives them from characters (x64 per byte), so a
    hash match proves the entire entropy/DCT pipeline exact on this
    class."""
    import numpy as np

    from mpes_spark.io.jpeg import read_jpeg, write_jpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nrows, npix, sums, mx = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:  # empty doc: no image, stats are zeros
                    nrows.append(0), npix.append(0)
                    sums.append(0), mx.append(0)
                    continue
                pad = (-len(raw)) % width
                tiles = np.frombuffer(raw + b"\x00" * pad, dtype="u1")
                img = np.repeat(
                    np.repeat(tiles.reshape(-1, width), 8, axis=0), 8, axis=1
                )
                decoded = read_jpeg(write_jpeg(img, quality=100))
                nrows.append(int(decoded.shape[0]))
                npix.append(int(decoded.size))
                sums.append(int(decoded.astype("int64").sum()))
                mx.append(int(decoded.max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_rows": pd.Series(nrows, dtype="int64"),
                    "n_pixels": pd.Series(npix, dtype="int64"),
                    "sum_pixels": pd.Series(sums, dtype="int64"),
                    "max_pixel": pd.Series(mx, dtype="int64"),
                }
            )

    return (
        _spread(docs, id_col)
        .mapInPandas(
            batches,
            schema=f"{id_col} bigint, n_rows bigint, n_pixels bigint, "
            "sum_pixels bigint, max_pixel bigint",
        )
    )


def jpeg_decode_stats_sql(
    table: str, width: int = 6, max_bytes: int = 48, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`jpeg_decode_stats`: every byte becomes a
    64-pixel constant tile, so pixel stats are character stats x 64
    plus the padding arithmetic."""
    return f"""
WITH chars AS (
  SELECT {id_col}, ascii(unnest(string_split(atext[1:{max_bytes}], ''))) AS byte
  FROM (SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}) p
  WHERE length(atext) > 0
),
agg AS (
  SELECT {id_col}, count(*) AS n_raw, sum(byte) AS s, max(byte) AS m
  FROM chars GROUP BY {id_col}
),
pads AS (
  SELECT {id_col}, n_raw, s, m,
         n_raw + ((-n_raw) % {width} + {width}) % {width} AS n_padded
  FROM agg
)
SELECT d.{id_col},
       CAST(COALESCE((n_padded // {width}) * 8, 0) AS BIGINT) AS n_rows,
       CAST(COALESCE(n_padded * 64, 0) AS BIGINT) AS n_pixels,
       CAST(COALESCE(s * 64, 0) AS BIGINT) AS sum_pixels,
       CAST(COALESCE(CASE WHEN n_padded > n_raw THEN greatest(m, 0) ELSE m END, 0)
            AS BIGINT) AS max_pixel
FROM {table} d LEFT JOIN pads USING ({id_col})
""".strip()


def flac_decode_stats(
    docs: DataFrame,
    rate: int = 16_000,
    max_bytes: int = 120,
    blocksize: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """The REAL FLAC codec under the hash gate (r9 late — the lossless
    third of the audio seam, closed the way TIFF/LZW closed the image
    one): each doc's leading bytes become an int16 PCM signal via a
    running PREFIX SUM (smooth -> the FIXED-predictor + Rice encoder
    path genuinely engages), ENCODED to multi-frame FLAC (``blocksize``
    32 forces several frames, coded frame numbers, per-frame CRCs) and
    DECODED back inside one Arrow batch, then reduced to integer
    statistics. ``sum_samples`` = sum of the prefix sums is POSITION-
    WEIGHTED in the raw bytes, so the gate proves decode preserves
    sample ORDER, not just the multiset — stronger than the WAV twin.
    The oracle re-derives everything from characters."""
    import numpy as np

    from mpes_spark.io.audio import decode_audio_bytes
    from mpes_spark.io.flac import write_flac

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ns, sums, last, rates = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:  # empty doc: zero-length PCM, stats zeros
                    ns.append(0), sums.append(0), last.append(0)
                    rates.append(rate)
                    continue
                sig = np.cumsum(
                    np.frombuffer(raw, dtype="u1").astype(np.int64)
                ).astype(np.int16)
                decoded, got_rate = decode_audio_bytes(
                    write_flac(sig, rate, blocksize=blocksize)
                )
                ns.append(int(decoded.size))
                sums.append(int(decoded.astype("int64").sum()))
                last.append(int(decoded[-1]))
                rates.append(int(got_rate))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_samples": pd.Series(sums, dtype="int64"),
                    "last_sample": pd.Series(last, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_samples bigint, sum_samples bigint, "
        "last_sample bigint, sample_rate bigint",
    )


def flac_decode_stats_sql(
    table: str, rate: int = 16_000, max_bytes: int = 120, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`flac_decode_stats`: sample i is the
    prefix sum of the leading bytes, so sum(samples) is the position-
    weighted sum ``sum_i (n - i + 1) * byte_i`` and the last sample is
    the plain byte total (ASCII fixtures: every byte >= 1)."""
    return f"""
WITH atab AS (
  SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}
),
pos AS (
  SELECT {id_col}, least(length(atext), {max_bytes}) AS n, i,
         ascii(substr(atext, CAST(i AS INTEGER), 1)) AS byte
  FROM atab, unnest(range(1, least(length(atext), {max_bytes}) + 1)) r(i)
  WHERE length(atext) > 0
),
agg AS (
  SELECT {id_col},
         CAST(max(n) AS BIGINT) AS n_samples,
         CAST(sum((n - i + 1) * byte) AS BIGINT) AS sum_samples,
         CAST(sum(byte) AS BIGINT) AS last_sample
  FROM pos GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(n_samples, 0) AS n_samples,
       COALESCE(sum_samples, 0) AS sum_samples,
       COALESCE(last_sample, 0) AS last_sample,
       CAST({rate} AS BIGINT) AS sample_rate
FROM {table} d LEFT JOIN agg USING ({id_col})
""".strip()


def video_decode_stats(
    docs: DataFrame, max_bytes: int = 96, id_col: str = "doc_id"
) -> DataFrame:
    """The REAL video container under the hash gate (r8, completing
    the image/audio/video codec trio): each doc's leading bytes become
    two 4x4 RGB frames, ENCODED into an uncompressed-DIB AVI (header +
    movi + idx1) and round-tripped back through the numpy-only
    container parser (header parse -> idx1 frame index -> DIB decode)
    inside one Arrow batch, then reduced to integer pixel statistics.
    The oracle re-derives the stats from the characters, so a hash
    match proves container encode -> index -> decode lossless."""
    import numpy as np

    from mpes_spark.io.video import (
        avi_frame_index,
        decode_avi_frame,
        read_avi_header,
        write_avi_dib,
    )

    if max_bytes != 96:  # 2 frames x 4x4 RGB; keep both twins in lockstep
        raise ValueError("video_decode_stats requires max_bytes == 96")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nf, npx, sums, mx = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                raw = raw + b"\x00" * (max_bytes - len(raw))
                frames = list(
                    np.frombuffer(raw, dtype="u1").reshape(2, 4, 4, 3)
                )
                avi = write_avi_dib(frames, fps=25)
                hdr = read_avi_header(avi)
                idx = avi_frame_index(avi)
                decoded = [
                    decode_avi_frame(avi, o, s, hdr["width"], hdr["height"], hdr["codec"])
                    for o, s in idx
                ]
                stack = np.stack(decoded)
                ids.append(did)
                nf.append(int(hdr["n_frames"]))
                npx.append(int(stack.size))
                sums.append(int(stack.astype("int64").sum()))
                mx.append(int(stack.max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nf, dtype="int64"),
                    "n_pixels": pd.Series(npx, dtype="int64"),
                    "sum_pixels": pd.Series(sums, dtype="int64"),
                    "max_pixel": pd.Series(mx, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_frames bigint, n_pixels bigint, "
        "sum_pixels bigint, max_pixel bigint",
    )


def video_decode_stats_sql(
    table: str, max_bytes: int = 96, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`video_decode_stats` (ASCII fixtures: pixel
    i = ascii(char i) of the leading bytes, zero-padded to
    ``max_bytes``; all texts exceed 32 in code, so padding never wins
    the max)."""
    if max_bytes != 96:  # same lockstep guard as the Spark twin
        raise ValueError("video_decode_stats requires max_bytes == 96")
    return f"""
SELECT {id_col},
       CAST(2 AS BIGINT) AS n_frames,
       CAST({max_bytes} AS BIGINT) AS n_pixels,
       CAST(sum(byte) AS BIGINT) AS sum_pixels,
       CAST(max(byte) AS BIGINT) AS max_pixel
FROM (
  SELECT {id_col}, ascii(unnest(string_split(atext[1:{max_bytes}], ''))) AS byte
  FROM (SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}) p
) GROUP BY {id_col}
""".strip()


def sample_frames_decoded(
    assets: DataFrame, every_n: int = 1, id_col: str = "asset_id"
) -> DataFrame:
    """REAL video frame extraction (r8): for DIB-AVI payloads, parse
    the container, take every ``every_n``-th entry of the frame index,
    DECODE those frames, and emit one row per sampled frame with
    integer pixel stats — the decoded upgrade of :func:`sample_frames`
    (which emits a manifest without touching payload bytes).
    mapInPandas, partition-preserving; compressed codecs raise the
    documented env gate instead of passing through wrong."""
    from mpes_spark.io.video import (
        avi_frame_index,
        decode_avi_frame,
        read_avi_header,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, sums, mx = [], [], [], []
            for aid, payload in zip(pdf[id_col], pdf["payload"]):
                avi = bytes(payload)
                hdr = read_avi_header(avi)
                idx = avi_frame_index(avi)
                for i in range(0, len(idx), every_n):
                    off, size = idx[i]
                    frame = decode_avi_frame(
                        avi, off, size, hdr["width"], hdr["height"], hdr["codec"]
                    )
                    ids.append(aid)
                    fidx.append(i)
                    sums.append(int(frame.astype("int64").sum()))
                    mx.append(int(frame.max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "sum_pixels": pd.Series(sums, dtype="int64"),
                    "max_pixel": pd.Series(mx, dtype="int64"),
                }
            )

    return assets.select(id_col, "payload").mapInPandas(
        batches,
        schema=f"{id_col} bigint, frame_idx bigint, sum_pixels bigint, "
        "max_pixel bigint",
    )


def pxp_decode_stats(
    docs: DataFrame, max_bytes: int = 96, id_col: str = "doc_id"
) -> DataFrame:
    """The REAL Igor packed-experiment container under the hash gate
    (r10 — the .pxp sibling of hdf5_ingest_oracle): each doc's leading
    ASCII bytes become int32 wave data split across TWO waves in
    nested folders ('run/a' = first ceil(n/2) bytes, 'run/sub/b' =
    the rest, omitted when empty), packed to an IN-MEMORY .pxp —
    PTN003 records, folder start/end bracketing, complete v5 IBW
    images including their 16-bit header checksums — and parsed back
    through the full record walk inside one Arrow batch, then reduced
    to integer statistics. ``pos_dot`` weights each sample by its
    1-based position WITHIN its wave, so the gate proves the container
    preserves both the split boundary and sample order. The oracle
    re-derives everything from characters."""
    import numpy as np

    from mpes_spark.io.igor import load_pxp, pxp_bytes

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nw, npt, sall, dot = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:
                    nw.append(0), npt.append(0), sall.append(0), dot.append(0)
                    continue
                data = np.frombuffer(raw, dtype="u1").astype("i4")
                h = (len(data) + 1) // 2
                waves = {"run/a": data[:h]}
                if len(data) > h:
                    waves["run/sub/b"] = data[h:]
                back = load_pxp(pxp_bytes(waves))
                nw.append(len(back))
                npt.append(int(sum(w.data.size for w in back.values())))
                sall.append(int(sum(int(w.data.sum()) for w in back.values())))
                dot.append(
                    int(
                        sum(
                            int(
                                (
                                    w.data.astype("i8")
                                    * np.arange(1, w.data.size + 1)
                                ).sum()
                            )
                            for w in back.values()
                        )
                    )
                )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_waves": pd.Series(nw, dtype="int64"),
                    "n_points": pd.Series(npt, dtype="int64"),
                    "sum_all": pd.Series(sall, dtype="int64"),
                    "pos_dot": pd.Series(dot, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_waves bigint, n_points bigint, "
        "sum_all bigint, pos_dot bigint",
    )


def mat_decode_stats(
    docs: DataFrame, max_bytes: int = 96, id_col: str = "doc_id"
) -> DataFrame:
    """The Level-5 MAT container under the hash gate (r10 — the .mat
    sibling of hdf5_ingest_oracle/pxp_ingest_oracle): each doc's
    leading ASCII bytes split into variable ``a`` (first ceil(n/2)
    bytes, int32) and a nested struct ``s`` holding char field ``t``
    (the first min(n, 8) chars) plus float64 field ``b`` (the rest,
    omitted when empty), serialized to an IN-MEMORY zlib-compressed
    MAT-file (``mat_bytes``) and parsed back through the full element
    walk (``loadmat``), then reduced to integer statistics computed
    FROM THE PARSED VALUES. ``pos_dot`` weights each sample by its
    1-based position within its variable, so the split boundary and
    sample order are both under the hash; ``n_fields`` pins the
    struct's field census. The oracle re-derives everything from
    characters."""
    import numpy as np

    from mpes_spark.io.matlib import loadmat, mat_bytes

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nv, nf, sa, sb, dot, cs = [], [], [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                raw = _ascii_payload(text, max_bytes)
                ids.append(did)
                if not raw:
                    nv.append(0), nf.append(0), sa.append(0)
                    sb.append(0), dot.append(0), cs.append(0)
                    continue
                data = np.frombuffer(raw, dtype="u1")
                h = (len(data) + 1) // 2
                s: dict = {"t": raw[: min(len(data), 8)].decode("ascii")}
                if len(data) > h:
                    s["b"] = data[h:].astype("f8")
                back = loadmat(
                    mat_bytes(
                        {"a": data[:h].astype("i4"), "s": s},
                        do_compression=True,
                    )
                )
                a = back["a"].ravel()
                st = back["s"]
                b = st["b"].ravel() if "b" in st else np.empty(0)
                nv.append(len(back))
                nf.append(len(st))
                sa.append(int(a.sum()))
                sb.append(int(b.sum()))
                dot.append(
                    int((a.astype("i8") * np.arange(1, a.size + 1)).sum())
                    + int((b.astype("i8") * np.arange(1, b.size + 1)).sum())
                )
                cs.append(sum(ord(c) for c in st["t"]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_vars": pd.Series(nv, dtype="int64"),
                    "n_fields": pd.Series(nf, dtype="int64"),
                    "sum_a": pd.Series(sa, dtype="int64"),
                    "sum_b": pd.Series(sb, dtype="int64"),
                    "pos_dot": pd.Series(dot, dtype="int64"),
                    "char_sum": pd.Series(cs, dtype="int64"),
                }
            )

    return _spread(docs, id_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, n_vars bigint, n_fields bigint, "
        "sum_a bigint, sum_b bigint, pos_dot bigint, char_sum bigint",
    )


def mat_decode_stats_sql(
    table: str, max_bytes: int = 96, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`mat_decode_stats`: byte i of the ASCII
    projection lands in ``a`` (i <= ceil(n/2), in-variable position i)
    or ``b`` (position i - ceil(n/2)); ``t`` carries bytes 1..min(n,8);
    the struct has 2 fields iff the ``b`` half is non-empty."""
    return f"""
WITH atab AS (
  SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}
),
pos AS (
  SELECT {id_col}, least(length(atext), {max_bytes}) AS n, i,
         ascii(substr(atext, CAST(i AS INTEGER), 1)) AS byte
  FROM atab, unnest(range(1, least(length(atext), {max_bytes}) + 1)) r(i)
  WHERE length(atext) > 0
),
agg AS (
  SELECT {id_col},
         CAST(2 AS BIGINT) AS n_vars,
         CAST(CASE WHEN max(n) > (max(n) + 1) // 2 THEN 2 ELSE 1 END
              AS BIGINT) AS n_fields,
         CAST(sum(CASE WHEN i <= (n + 1) // 2 THEN byte ELSE 0 END)
              AS BIGINT) AS sum_a,
         CAST(sum(CASE WHEN i > (n + 1) // 2 THEN byte ELSE 0 END)
              AS BIGINT) AS sum_b,
         CAST(sum(CASE WHEN i <= (n + 1) // 2 THEN i * byte
                       ELSE (i - (n + 1) // 2) * byte END) AS BIGINT)
           AS pos_dot,
         CAST(sum(CASE WHEN i <= least(n, 8) THEN byte ELSE 0 END)
              AS BIGINT) AS char_sum
  FROM pos GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(n_vars, 0) AS n_vars,
       COALESCE(n_fields, 0) AS n_fields,
       COALESCE(sum_a, 0) AS sum_a,
       COALESCE(sum_b, 0) AS sum_b,
       COALESCE(pos_dot, 0) AS pos_dot,
       COALESCE(char_sum, 0) AS char_sum
FROM {table} d LEFT JOIN agg USING ({id_col})
""".strip()


def pxp_decode_stats_sql(
    table: str, max_bytes: int = 96, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`pxp_decode_stats`: byte i of the ASCII
    projection carries in-wave position i (i <= ceil(n/2)) or
    i - ceil(n/2); wave count is 0/1/2 by payload length."""
    return f"""
WITH atab AS (
  SELECT {id_col}, {_ASCII_TEXT_SQL} AS atext FROM {table}
),
pos AS (
  SELECT {id_col}, least(length(atext), {max_bytes}) AS n, i,
         ascii(substr(atext, CAST(i AS INTEGER), 1)) AS byte
  FROM atab, unnest(range(1, least(length(atext), {max_bytes}) + 1)) r(i)
  WHERE length(atext) > 0
),
agg AS (
  SELECT {id_col},
         CAST(CASE WHEN max(n) > (max(n) + 1) // 2 THEN 2 ELSE 1 END
              AS BIGINT) AS n_waves,
         CAST(max(n) AS BIGINT) AS n_points,
         CAST(sum(byte) AS BIGINT) AS sum_all,
         CAST(sum(CASE WHEN i <= (n + 1) // 2 THEN i * byte
                       ELSE (i - (n + 1) // 2) * byte END) AS BIGINT)
           AS pos_dot
  FROM pos GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(n_waves, 0) AS n_waves,
       COALESCE(n_points, 0) AS n_points,
       COALESCE(sum_all, 0) AS sum_all,
       COALESCE(pos_dot, 0) AS pos_dot
FROM {table} d LEFT JOIN agg USING ({id_col})
""".strip()
