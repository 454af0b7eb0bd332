"""Multimodal + embedding-generation graded queries (SURVEY.md §2.I).

The payload plumbing is exercised with utf-8 bytes standing in for
media bytes (no imaging libs in this environment): metadata extraction
and checksums are oracle-paired; the featurizer / frame-sampler are
rows-only (engine-defined vectors)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

from noaa_etl_spark.io import load_table
from noaa_etl_spark.operators.multimodal import attach_payload, featurize, sample_frames
from noaa_etl_spark.registry import graded


@graded(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'mem://doc/' || CAST(doc_id AS VARCHAR) AS uri,
           'text/plain'                            AS mime,
           octet_length(CAST(text AS BLOB))        AS n_bytes,
           md5(text)                               AS checksum
    FROM documents
    ORDER BY doc_id
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct: attach payloads to the
    documents table, flatten metadata, add a content checksum."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    return with_payload.select(
        "doc_id",
        F.col("meta.uri").alias("uri"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    ).orderBy("doc_id")


@graded(
    "q_multimodal_features",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(CAST(text AS BLOB)) AS h,
             octet_length(CAST(text AS BLOB)) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, n,
             CAST(('0x' || substr(h, i.i * 2 + 1, 2)) AS INT) % 8 AS bin
      FROM b, (SELECT unnest(range(0, 16384)) AS i) i
      WHERE i.i < n
    ),
    hist AS (
      SELECT doc_id, bin, count(*) AS c FROM bytes GROUP BY doc_id, bin
    ),
    spine AS (
      SELECT b.doc_id, b.n, s.bin, coalesce(hh.c, 0) AS c
      FROM b
      CROSS JOIN (SELECT unnest(range(0, 8)) AS bin) s
      LEFT JOIN hist hh ON hh.doc_id = b.doc_id AND hh.bin = s.bin
    )
    SELECT doc_id,
           round(sum(CASE WHEN bin = 0 THEN CAST(c AS DOUBLE) / n END), 6) AS f0,
           round(sum(CAST(c AS DOUBLE) / n ORDER BY bin), 6) AS f_sum,
           CAST(8 AS INT) AS dim
    FROM spine GROUP BY doc_id, n ORDER BY doc_id
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch 'decode + featurize' over binary payloads via mapInPandas
    (deterministic byte-histogram stand-in for a media encoder).

    CONVERTED rows-only → oracle-paired (round 13, the lang_id class):
    the fake featurizer is a normalized byte-value histogram mod 8 over
    the utf-8 payload, which DuckDB replays exactly by hex()-expanding
    the blob and binning two-hex-digit bytes; f_sum folds the 8 bins in
    bin order on both sides (Python list comprehension == sum ORDER BY
    bin, both seeded at 0.0), and each bin share c/n is one correctly-
    rounded division of exact integers ⇒ 6-dp rounds agree bit-for-bit.
    The oracle's 16384-byte range bound is a fixture contract (docs are
    a few KB); real encoders are where the mapInPandas plumbing — the
    thing this query grades — stays identical."""
    docs = load_table(spark, sf_dir, "documents")
    feats = featurize(attach_payload(docs))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias("f_sum"),
        F.size("features").alias("dim"),
    ).orderBy("doc_id")


@graded(
    "q_frame_sample",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS INT) AS n_frames
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_frames)) AS BIGINT)      AS frame_idx,
           CAST(unnest(range(0, n_frames)) * 64 AS BIGINT) AS byte_offset
    FROM n
    ORDER BY doc_id, frame_idx
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape: one payload row → one row per fixed-size
    byte window with (frame_idx, byte_offset) for deferred decode."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return sample_frames(attach_payload(docs), every_n_bytes=64).orderBy(
        "doc_id", "frame_idx"
    )


@graded(
    "q_multimodal_decode",
    oracle="""
    WITH px AS (
      SELECT d.doc_id, r.r, k.k, c.c,
             (d.doc_id * 7 + r.r * 3 + k.k * 5 + c.c * 11) % 256 AS v
      FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d,
           (SELECT unnest(range(0, 12)) AS r) r,
           (SELECT unnest(range(0, 16)) AS k) k,
           (SELECT unnest(range(0, 3)) AS c) c
    )
    SELECT doc_id,
           16 AS width, 12 AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(sum((r * 48 + k * 3 + c) * v) AS BIGINT) AS pos_checksum,
           CAST(sum(v) AS DOUBLE) / 576 AS mean_px
    FROM px GROUP BY doc_id
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-paired: per doc a 16×12 RGB image is
    synthesized from the closed form v(r,k,c) = (id·7+r·3+k·5+c·11)
    mod 256, encoded to actual 24-bit BMP BYTES (operators/codecs —
    bottom-up rows, 4-byte padding, BGR order), then DECODED back by
    the pure-numpy BMP decoder inside mapInPandas. The graded columns
    include a position-weighted checksum Σ(r·W·3+k·3+c)·v, so any
    decoder bug — row flip, padding slip, channel-order swap — breaks
    the value hash against DuckDB's direct replay of the closed form.
    (The former NotImplementedError stub is gone: uncompressed formats
    decode natively; compressed ones remain an honest env gate.)

    Scale: encode+decode are scan-local Arrow batches; one row out per
    payload; no shuffle before the (tiny) graded aggregate.
    """
    import numpy as np

    from noaa_etl_spark.operators.codecs import decode_bmp, encode_bmp

    W, H = 16, 12
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id"
    )

    def synth_decode(batches):
        pos = np.arange(H * W * 3).reshape(H, W, 3)
        r = np.arange(H)[:, None, None]
        k = np.arange(W)[None, :, None]
        c = np.arange(3)[None, None, :]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                img = ((did * 7 + r * 3 + k * 5 + c * 11) % 256).astype(np.uint8)
                dec = decode_bmp(encode_bmp(img))  # decode REAL bytes
                v = dec.astype(np.int64)
                out.append(
                    (
                        did,
                        dec.shape[1],
                        dec.shape[0],
                        int(v.sum()),
                        int((pos * v).sum()),
                        float(v.sum()) / (W * H * 3),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "px_sum", "pos_checksum", "mean_px",
                ],
            )

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, width int, height int, px_sum bigint, "
        "pos_checksum bigint, mean_px double",
    )


@graded(
    "q_wav_decode",
    oracle="""
    WITH s AS (
      SELECT d.doc_id, i.i,
             ((d.doc_id * 31 + i.i * 17) % 65536) - 32768 AS v
      FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d,
           (SELECT unnest(range(0, 256)) AS i) i
      WHERE i.i < 200 + d.doc_id % 56
    )
    SELECT doc_id,
           CAST(200 + doc_id % 56 AS BIGINT) AS n_samples,
           16000 AS sample_rate,
           CAST(sum(v) AS BIGINT) AS sum_samples,
           CAST(sum(i * v) AS BIGINT) AS pos_checksum,
           CAST(max(abs(v)) AS BIGINT) AS max_abs
    FROM s GROUP BY doc_id
    """,
)
def q_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-paired (q_multimodal_decode's audio
    twin): per doc, 200+id%56 int16 samples from a closed form are
    encoded to actual RIFF/WAVE PCM bytes and decoded back by the
    pure-numpy WAV chunk-walker; the order-weighted checksum Σ i·vᵢ
    catches endianness/offset/interleave bugs against DuckDB's replay.
    """
    import numpy as np

    from noaa_etl_spark.operators.codecs import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id"
    )

    def synth_decode(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 200 + did % 56
                i = np.arange(n, dtype=np.int64)
                samples = (((did * 31 + i * 17) % 65536) - 32768).astype(np.int16)
                dec, rate = decode_wav(encode_wav(samples, 16_000))
                v = dec[:, 0].astype(np.int64)
                out.append(
                    (
                        did,
                        int(v.shape[0]),
                        int(rate),
                        int(v.sum()),
                        int((np.arange(v.shape[0]) * v).sum()),
                        int(np.abs(v).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "sum_samples", "pos_checksum", "max_abs",
                ],
            )

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, n_samples bigint, sample_rate int, "
        "sum_samples bigint, pos_checksum bigint, max_abs bigint",
    )


@graded(
    "q_audio_resample",
    oracle="""
    WITH src AS (
      SELECT d.doc_id, i.i,
             ((d.doc_id * 31 + i.i * 17) % 65536) - 32768 AS v,
             200 + d.doc_id % 56 AS n_in
      FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d,
           (SELECT unnest(range(0, 256)) AS i) i
      WHERE i.i < 200 + d.doc_id % 56
    ),
    outpos AS (
      SELECT s.doc_id, j.j,
             (j.j * 8) // 3 AS k,
             (j.j * 8) % 3 AS r
      FROM (SELECT DISTINCT doc_id, n_in FROM src) s,
           (SELECT unnest(range(0, 700)) AS j) j
      WHERE j.j <= ((s.n_in - 1) * 3) // 8
    ),
    vals AS (
      SELECT o.doc_id, o.j,
             CAST(floor(CAST((3 - o.r) * a.v + o.r * coalesce(b.v, 0) AS DOUBLE)
                        / 3.0) AS BIGINT) AS y
      FROM outpos o
      JOIN src a ON a.doc_id = o.doc_id AND a.i = o.k
      LEFT JOIN src b ON b.doc_id = o.doc_id AND b.i = o.k + 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_out,
           6000 AS out_rate,
           CAST(sum(y) AS BIGINT) AS sum_out,
           CAST(sum(j * y) AS BIGINT) AS pos_checksum,
           CAST(max(abs(y)) AS BIGINT) AS max_abs
    FROM vals GROUP BY doc_id
    """,
)
def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling through the REAL codec path (q_image_resize's
    audio sibling): per doc, closed-form int16 samples are encoded to
    actual RIFF/WAVE bytes, decoded back by the pure-numpy chunk
    walker, linearly resampled 16 kHz → 6 kHz by the integer-exact
    floor rule (operators/codecs.resample_linear: source position
    j·8/3, value = floor(((3−r)v[k] + r·v[k+1])/3) — floor, never
    truncation, because samples are signed), and summarized with the
    position-weighted checksum that catches off-by-one/phase bugs. The
    oracle replays the interpolation arithmetic in closed form, so the
    grade proves synthesis → encode → decode → resample end to end
    (the detection-vs-construction doctrine).

    Scale: scan-local mapInPandas — one Arrow batch in, six scalars
    out per blob; no shuffle before the final tiny census."""
    import numpy as np

    from noaa_etl_spark.operators.codecs import (
        decode_wav,
        encode_wav,
        resample_linear,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id"
    )

    def synth_resample(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 200 + did % 56
                i = np.arange(n, dtype=np.int64)
                samples = (((did * 31 + i * 17) % 65536) - 32768).astype(np.int16)
                dec, rate = decode_wav(encode_wav(samples, 16_000))
                y = resample_linear(dec[:, 0], 8, 3)
                jj = np.arange(y.shape[0], dtype=np.int64)
                out.append(
                    (
                        did,
                        int(y.shape[0]),
                        (rate * 3) // 8,
                        int(y.sum()),
                        int((jj * y).sum()),
                        int(np.abs(y).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_out", "out_rate",
                    "sum_out", "pos_checksum", "max_abs",
                ],
            )

    return docs.mapInPandas(
        synth_resample,
        "doc_id bigint, n_out bigint, out_rate int, "
        "sum_out bigint, pos_checksum bigint, max_abs bigint",
    )


# --- embedding generation stub (embed_udf) ----------------------------

_EMBED_DIM = 16


@pandas_udf(ArrayType(FloatType()))
def _hashed_bow_embed(texts: pd.Series) -> pd.Series:
    """Deterministic embedding stub: hashed bag-of-words into a fixed
    dim, L2-normalized. Same Spark plumbing (Arrow batches in,
    float-vector column out) as a real encoder.

    Token→(slot, sign) lookups are memoized per executor: vocabulary
    reuse makes the md5 of an already-seen token pure waste (a corpus
    has far fewer distinct tokens than token occurrences — the memo
    turns the digest cost from per-occurrence into per-vocab-entry).
    Capped so an adversarial vocabulary cannot grow worker memory
    unboundedly; eviction just falls back to hashing."""
    import hashlib
    import math

    memo = _hashed_bow_embed_memo
    MEMO_CAP = 1_000_000

    def tok_slot(tok: str) -> tuple[int, float]:
        hit = memo.get(tok)
        if hit is None:
            digest = hashlib.md5(tok.encode()).digest()
            hit = (digest[0] % _EMBED_DIM, 1.0 if digest[1] % 2 == 0 else -1.0)
            if len(memo) < MEMO_CAP:
                memo[tok] = hit
        return hit

    def embed(t: str) -> list[float]:
        vec = [0.0] * _EMBED_DIM
        for tok in (t or "").split(" "):
            idx, sign = tok_slot(tok)
            vec[idx] += sign
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        return [x / norm for x in vec]

    return texts.map(embed)


_hashed_bow_embed_memo: dict = {}


@graded("q_doc_similarity")  # rows-only: engine-defined embeddings feed the ANN
def q_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end document similarity: embed documents (stub encoder) →
    approximate top-3 cosine neighbors per document via the IVF index —
    the full 'semantic search over a corpus you embedded yourself'
    pipeline, served the way a 100 TB corpus would be.

    IVF is the default ANN (``ann_index``): measured recall 0.91+ at
    n_probe=4/16 on these hashed-BoW embeddings (asserted vs the exact
    blocked-BLAS baseline in tests/test_algorithms.py), and its
    candidate join is bounded by probed-cell occupancy, never |Q|·|C|.
    The SRP-LSH fallback serves un-clustered corpora; the exact form
    remains the verification baseline."""
    from noaa_etl_spark.operators.similarity import ann_index

    docs = load_table(spark, sf_dir, "documents")
    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        _hashed_bow_embed(F.col("text")).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 50)
    # No terminal orderBy: the graded compare is order-insensitive and a
    # global sort costs a rangepartitioning exchange (the r5 lesson).
    return ann_index(queries, emb, k=3, index="ivf", n_cells=16, n_probe=4)


@graded("q_embed_docs")  # rows-only: engine-defined embedding stub
def q_embed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding generation over documents (hashed-BoW stub encoder),
    summarized per doc (norm should be 1.0, dim fixed)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = docs.select("doc_id", _hashed_bow_embed(F.col("text")).alias("embedding"))
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x))
    return emb.select(
        "doc_id",
        F.round(norm, 6).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    ).orderBy("doc_id")


@graded(
    "q_image_resize",
    oracle="""
    WITH px AS (
      SELECT d.doc_id, r.r2, k.k2, c.c,
             (d.doc_id * 7 + (2 * r.r2) * 3 + (2 * k.k2) * 5 + c.c * 11) % 256 AS v
      FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d,
           (SELECT unnest(range(0, 6)) AS r2) r,
           (SELECT unnest(range(0, 8)) AS k2) k,
           (SELECT unnest(range(0, 3)) AS c) c
    )
    SELECT doc_id,
           8 AS width, 6 AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(sum((r2 * 24 + k2 * 3 + c) * v) AS BIGINT) AS pos_checksum,
           CAST(sum(v) AS DOUBLE) / 144 AS mean_px
    FROM px GROUP BY doc_id
    """,
)
def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize (nearest-neighbor 2× downsample), oracle-paired the
    q_multimodal_decode way: per doc a 16×12 RGB image from the closed
    form v(r,k,c) = (id·7+r·3+k·5+c·11) mod 256 is encoded to REAL BMP
    bytes, decoded back, and resized to 8×6 by
    operators/codecs.resize_nearest (top-left-anchor floor rule — exact
    stride slicing at integer factors). Nearest-neighbor keeps every
    output pixel an EXACT source pixel, so DuckDB replays the closed
    form at the even (2r, 2k) grid and the position-weighted checksum
    catches any anchor slip, axis swap, or channel reorder — the decode
    query's bug-surface argument extended through the resize.

    Scale: encode+decode+resize are scan-local Arrow batches (one row
    out per payload, no shuffle before the tiny graded agg); resize is
    the first step of every thumbnail/feature-extract stage, and the
    32×-smaller pixel payload is what actually crosses the wire
    downstream.
    """
    import numpy as np

    from noaa_etl_spark.operators.codecs import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )

    W, H, W2, H2 = 16, 12, 8, 6
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id"
    )

    def synth_resize(batches):
        pos = np.arange(H2 * W2 * 3).reshape(H2, W2, 3)
        r = np.arange(H)[:, None, None]
        k = np.arange(W)[None, :, None]
        c = np.arange(3)[None, None, :]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                img = ((did * 7 + r * 3 + k * 5 + c * 11) % 256).astype(np.uint8)
                small = resize_nearest(decode_bmp(encode_bmp(img)), H2, W2)
                v = small.astype(np.int64)
                out.append(
                    (
                        did,
                        small.shape[1],
                        small.shape[0],
                        int(v.sum()),
                        int((pos * v).sum()),
                        float(v.sum()) / (W2 * H2 * 3),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "px_sum", "pos_checksum", "mean_px",
                ],
            )

    return docs.mapInPandas(
        synth_resize,
        "doc_id bigint, width int, height int, px_sum bigint, "
        "pos_checksum bigint, mean_px double",
    )


MIME_SNIFF_ORACLE = """
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN substr(md5('mime:' || CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                    THEN 'image/bmp'
                  WHEN substr(md5('mime:' || CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                    THEN 'audio/wav'
                  WHEN substr(md5('mime:' || CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                    THEN 'image/x-portable-pixmap'
                  ELSE 'text/plain' END AS mime,
             CASE WHEN substr(md5('mime:' || CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                    THEN 6
                  WHEN substr(md5('mime:' || CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                    THEN 4
                  WHEN substr(md5('mime:' || CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                    THEN 3
                  ELSE 1 END + octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT mime AS detected_mime,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM planted GROUP BY mime ORDER BY mime
    """


def mime_census(docs: DataFrame) -> DataFrame:
    """Per-mime census partials (detected_mime, n, total_bytes, min_doc)
    from a documents slice — the mergeable state of the sniff report
    (n/total_bytes sum-merge, min_doc min-merges), shared by q_mime_sniff
    and its streaming twin."""
    g = F.substring(
        F.md5(F.concat(F.lit("mime:"), F.col("doc_id").cast("string"))), 1, 1
    )
    text_bin = F.col("text").cast("binary")
    # The text leg is guarded with a one-byte non-magic sentinel ('\n'):
    # without it, a document whose raw text happens to start with 'BM',
    # 'RIFF', or 'P6\n' would be DETECTED as a binary format while the
    # oracle predicts text/plain from the gate — the grade would be
    # silently fixture-content-dependent (ADVICE r12; the round-4
    # regen-incident class). With the sentinel, gate ⇒ detection is a
    # theorem: no sentinel-prefixed payload matches any magic.
    payload = (
        F.when(g < "4", F.concat(F.lit(b"BM\x00\x00\x00\x00"), text_bin))
        .when(g < "8", F.concat(F.lit(b"RIFF"), text_bin))
        .when(g < "c", F.concat(F.lit(b"P6\n"), text_bin))
        .otherwise(F.concat(F.lit(b"\n"), text_bin))
    )
    blobs = docs.select("doc_id", payload.alias("payload"))
    prefix2 = F.substring(F.col("payload"), 1, 2)
    prefix4 = F.substring(F.col("payload"), 1, 4)
    detected = (
        F.when(prefix2 == F.lit(b"BM"), "image/bmp")
        .when(prefix4 == F.lit(b"RIFF"), "audio/wav")
        .when(F.substring(F.col("payload"), 1, 3) == F.lit(b"P6\n"),
              "image/x-portable-pixmap")
        .otherwise("text/plain")
    )
    return (
        blobs.select(
            "doc_id",
            detected.alias("detected_mime"),
            F.octet_length("payload").cast("bigint").alias("n_bytes"),
        )
        .groupBy("detected_mime")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
    )


@graded("q_mime_sniff", oracle=MIME_SNIFF_ORACLE)
def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte MIME detection over an opaque binary column — the
    intake-triage step of every multimodal pipeline (route each blob to
    the right decoder BEFORE trusting any sidecar metadata; mislabeled
    uploads are the norm in crawled corpora). The fixture plants a
    deterministic format mix by md5 gate (25% BMP 'BM', 25% WAV
    'RIFF…WAVE'-prefix, 25% PPM 'P6\\n', 25% bare utf-8), builds REAL
    header bytes on the Spark side, and sniffs them back with binary
    prefix tests; the oracle predicts the same census from the gate in
    closed form — so the grade proves synthesis → sniff → aggregate
    round-trips exactly (the q_multimodal_decode oracle pattern:
    detection is graded against construction, not against itself).

    Scale: payload synthesis, prefix test, and byte length are all
    scan-local expressions; one combinable |mimes|-row agg. Real
    corpora swap the synthesis for the raw payload column — the sniff
    + census stays identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    return mime_census(docs)
