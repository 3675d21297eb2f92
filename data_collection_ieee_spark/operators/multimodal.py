"""Multimodal-column operators (north-star surface).

Model: media payloads are opaque `binary` columns with typed scalar
metadata beside them — the only schema that survives 100 TB (never
parse media into rows; keep bytes opaque, project metadata, and run
decode/feature kernels as Arrow-batched pandas functions).

The test corpus has no real media, so the payload is the UTF-8 encoding
of `documents.text` — which makes every piece of *plumbing* (binary
schema through parquet/Arrow, batched kernels, frame explosion,
vector+scalar mixed projection) real and oracle-checkable, while the
image/audio codec itself is a clearly-marked deterministic stub
(`_fake_decode`; a real deployment swaps in PIL/ffmpeg there — those
libs are intentionally not imported).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_collection_ieee_spark.catalog import load_table
from data_collection_ieee_spark.registry import query


@query(
    "multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, d.n_chars, e.label,
       CAST(len(e.embedding) AS INT) AS dim,
       round(CAST(e.embedding[1] AS DOUBLE), 4) + 0.0 AS emb_head
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings with a mixed scalar/vector projection —
    the array column rides through the shuffle untouched (columnar
    Arrow both sides; no serialization cliff)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return docs.join(emb, docs.doc_id == emb.vec_id, "inner").select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.size("embedding").alias("dim"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0.0)).alias(
            "emb_head"
        ),
    )


@query(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
""",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload metadata projection: byte length + content digest
    computed on the binary column, never decoding it."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


_FRAME_BYTES = 32
_FRAME_STRIDE = 2  # sample every 2nd frame


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH lists AS (
  SELECT doc_id,
         [substr(text, 1 + j * {_FRAME_BYTES}, {_FRAME_BYTES})
          for j in range(0, (length(text) + {_FRAME_BYTES} - 1) // {_FRAME_BYTES})] AS frames
  FROM documents
),
exploded AS (
  SELECT doc_id,
         CAST(generate_subscripts(frames, 1) - 1 AS INT) AS frame_no,
         unnest(frames) AS frame
  FROM lists
)
SELECT doc_id, frame_no, md5(frame) AS frame_md5
FROM exploded
WHERE frame_no % {_FRAME_STRIDE} = 0
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque payload (the video-keyframe
    pattern): fixed-size windows → explode → stride filter → per-frame
    digest. Output cardinality is frames/stride; the explode is a
    narrow transform, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / F.lit(_FRAME_BYTES)).cast("int")
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
        F.col("text"),
    ).filter(F.col("frame_no") % _FRAME_STRIDE == 0)
    frame = F.expr(f"substring(text, 1 + frame_no * {_FRAME_BYTES}, {_FRAME_BYTES})")
    return frames.select(
        "doc_id", "frame_no", F.md5(frame.cast("binary")).alias("frame_md5")
    )


_WAV_RATE = 8000


def _synth_wav(text: str) -> bytes:
    """Render a document as a REAL mono 16-bit PCM WAV file (RIFF
    container written by the stdlib `wave` codec): one sample per
    character, amplitude ((codepoint % 256) − 128) · 256. The payload
    is a genuine, externally playable media file — not a pseudo-blob."""
    import io
    import wave

    import numpy as np

    samples = (
        (np.frombuffer(text.encode("latin-1", "replace"), dtype=np.uint8).astype(np.int16) - 128)
        * 256
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_WAV_RATE)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> dict:
    """REAL media decode: parse the RIFF/WAVE header and PCM frames with
    the stdlib `wave` codec (this function decodes any mono 16-bit PCM
    WAV, not just the synthesized ones) and derive signal features."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    if n_frames == 0:
        rms, peak = None, None
    else:
        s = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        rms = round(float(np.sqrt(np.mean(s * s))), 4)
        peak = int(np.max(np.abs(s)))
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "sample_width": width,
        "n_frames": n_frames,
        "rms": rms,
        "peak": peak,
    }


@query(
    "multimodal_decode_features",
    oracle=f"""
SELECT doc_id,
       CAST({_WAV_RATE} AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(2 AS INT) AS sample_width,
       CAST(length(text) AS BIGINT) AS n_frames,
       CASE WHEN length(text) > 0 THEN
         round(sqrt(list_avg([power(CAST((ord(substr(text, i, 1)) % 256 - 128) * 256 AS DOUBLE), 2)
                              for i in range(1, length(text) + 1)])), 4)
       END AS rms,
       CASE WHEN length(text) > 0 THEN
         CAST(list_max([abs((ord(substr(text, i, 1)) % 256 - 128) * 256)
                        for i in range(1, length(text) + 1)]) AS INT)
       END AS peak
FROM documents
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode media pipeline over opaque binary payloads, with a
    REAL codec on both sides: each document is rendered to an actual
    RIFF/WAVE file (stdlib `wave` writer), carried as a `binary` column
    through Arrow, then header-parsed and PCM-decoded back (stdlib
    `wave` reader) into signal features (rate/channels/width from the
    real header parse; RMS + peak from the real sample decode).

    The oracle recomputes every feature from first principles on the
    source text, so the full encode→binary→decode path is value-hash
    checked — no stub remains. Both kernels are Arrow-batched
    mapInPandas; payloads never leave the executor, which is the
    100 TB shape for media feature extraction (swap `wave` for
    PIL/ffmpeg for other codecs — identical plumbing)."""
    docs = load_table(spark, sf_dir, "documents")

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [_synth_wav(t) for t in pdf["text"]],
                }
            )

    with_payload = docs.select("doc_id", "text").mapInPandas(
        encode_batches, schema="doc_id bigint, payload binary"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame([_decode_wav(bytes(p)) for p in pdf["payload"]])
            feats.insert(0, "doc_id", pdf["doc_id"].values)
            yield feats

    return with_payload.mapInPandas(
        decode_batches,
        schema=(
            "doc_id bigint, sample_rate int, n_channels int, sample_width int, "
            "n_frames bigint, rms double, peak int"
        ),
    )


_AUDIO_WIN = 64  # bytes per analysis window (tumbling)


@query(
    "multimodal_audio_energy",
    oracle=f"""
WITH lists AS (
  SELECT doc_id,
         [substr(text, 1 + j * {_AUDIO_WIN}, {_AUDIO_WIN})
          for j in range(0, (length(text) + {_AUDIO_WIN} - 1) // {_AUDIO_WIN})] AS wins
  FROM documents
),
exploded AS (
  SELECT doc_id,
         CAST(generate_subscripts(wins, 1) - 1 AS INT) AS win_no,
         unnest(wins) AS win
  FROM lists
),
scored AS (
  SELECT doc_id, win_no,
         CAST(length(win) AS INT) AS win_len,
         CAST(list_sum([ord(substr(win, i, 1)) for i in range(1, length(win) + 1)]) AS BIGINT)
           AS energy
  FROM exploded
)
SELECT doc_id, win_no, win_len, energy,
       round(CAST(energy AS DOUBLE) / win_len, 4) AS mean_level
FROM scored
""",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed signal-energy extraction (the audio-analysis pattern):
    tumbling fixed-size windows over the opaque payload, one integer
    energy per window — computed entirely in-row (sequence + aggregate,
    no shuffle), with the window explode as the only row expansion.
    The byte-sum stands in for a real sample-decode (see _fake_decode's
    stub note); window shape, indexing, and exactness are the real
    design. Integer energies agree with the oracle exactly; the mean
    level is one double division + round."""
    docs = load_table(spark, sf_dir, "documents")
    n_wins = F.ceil(F.length("text") / F.lit(_AUDIO_WIN)).cast("int")
    exploded = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_wins - 1)).alias("win_no"),
        "text",
    )
    # let-bind the window substring so it is cut once per row, not
    # re-evaluated inside every energy-fold step
    wins = exploded.select(
        "doc_id",
        "win_no",
        F.expr(
            f"""
            element_at(transform(array(substring(text, 1 + win_no * {_AUDIO_WIN}, {_AUDIO_WIN})),
              w -> struct(
                cast(length(w) as int) AS win_len,
                aggregate(sequence(1, length(w)), cast(0 as bigint),
                          (acc, i) -> acc + ascii(substring(w, i, 1))) AS energy)
            ), 1)
            """
        ).alias("s"),
    )
    return wins.select(
        "doc_id",
        "win_no",
        F.col("s.win_len").alias("win_len"),
        F.col("s.energy").alias("energy"),
    ).withColumn("mean_level", F.round(F.col("energy").cast("double") / F.col("win_len"), 4))


_CHUNK_CHARS = 64  # fixed-width chunking (a CDC rolling boundary drops in here)


@query(
    "multimodal_chunk_dedup",
    oracle=f"""
WITH lists AS (
  SELECT doc_id,
         [substr(text, 1 + j * {_CHUNK_CHARS}, {_CHUNK_CHARS})
          for j in range(0, (length(text) + {_CHUNK_CHARS} - 1) // {_CHUNK_CHARS})] AS chunks
  FROM documents
),
exploded AS (
  SELECT doc_id, md5(unnest(chunks)) AS h FROM lists
),
freq AS (
  SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM exploded GROUP BY h
)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
       round(CAST(SUM(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS shared_ratio
FROM exploded e JOIN freq f USING (h)
GROUP BY e.doc_id
""",
)
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level storage dedup over opaque payloads — the
    content-addressed-store diagnostic for media blobs: split each
    payload into fixed 64-byte chunks, digest each, and report per
    asset how many of its chunks also occur in OTHER assets (the bytes
    a dedupe store would not have to keep twice). Fixed-width chunking
    keeps the oracle exact; a production store swaps in content-defined
    (rolling-hash) boundaries at the marked constant without touching
    the plan.

    Plan: in-row slice list (no string explode of transform-built
    n-grams — chunks are disjoint slices, linear total volume, unlike
    the overlapping-shingle trap) → posexplode → per-digest
    document-frequency (map-side combined) → join back on digest →
    per-asset aggregate. Two digest-keyed shuffles, both linear in
    corpus bytes / chunk size; digests are 16-byte keys so the shuffle
    volume is corpus_bytes/4 at this chunk size."""
    docs = load_table(spark, sf_dir, "documents")
    # length > 0 guard: for empty text Spark's sequence(0, -1) auto-steps
    # DOWN and yields [0, -1] (two bogus chunks) while the oracle's
    # range(0, 0) is empty — zero-length payloads must emit no chunks.
    chunks = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"""
                transform(
                  sequence(0, CAST((length(text) + {_CHUNK_CHARS} - 1) DIV {_CHUNK_CHARS} AS INT) - 1),
                  j -> substring(text, 1 + j * {_CHUNK_CHARS}, {_CHUNK_CHARS}))
                """
                )
            ).alias("chunk"),
        )
        .select("doc_id", F.md5(F.encode("chunk", "UTF-8")).alias("h"))
    )
    freq = chunks.groupBy("h").agg(F.countDistinct("doc_id").alias("ndocs"))
    shared = F.when(F.col("ndocs") >= 2, 1).otherwise(0)
    return (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(shared).cast("long").alias("n_shared_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared_chunks",
            F.round(
                F.col("n_shared_chunks").cast("double") / F.col("n_chunks"), 4
            ).alias("shared_ratio"),
        )
    )
