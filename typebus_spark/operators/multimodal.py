"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (north-star extension, BASELINE.json).

Data model: a media column is a struct
``{blob: binary, mime: string, meta: map<string,string>}`` — the
BinaryType analog of the reference's opaque Avro payload
(event/package.scala:166-169). All heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched ``mapInPandas``
stages so batches stream through executors without materializing a
partition in memory; partitioning/caller contracts are real and tested.

The actual pixel/sample decode is STUBBED: codec libraries (PIL,
ffmpeg, librosa) are not in this container. ``decoder=None`` selects a
deterministic fake (byte-statistics features) so plumbing tests are
reproducible; pass a real decoder callable in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_DDL = "blob binary, mime string, meta map<string,string>"


def attach_blob(
    df: DataFrame, source_col: str, mime, id_col: str
) -> DataFrame:
    """Wrap a column's bytes as a media struct (here: utf-8 of a text
    column or an existing binary column). ``mime`` is a literal string
    or a per-row Column (mixed-modality tables)."""
    blob = (
        F.col(source_col).cast("binary")
        if dict(df.dtypes)[source_col] == "binary"
        else F.encode(F.col(source_col), "UTF-8")
    )
    mime_col = F.lit(mime) if isinstance(mime, str) else mime
    return df.select(
        F.col(id_col),
        F.struct(
            blob.alias("blob"),
            mime_col.alias("mime"),
            F.create_map(
                F.lit("source"), F.lit(source_col)
            ).alias("meta"),
        ).alias("media"),
    )


def blob_stats(df: DataFrame, id_col: str, media_col: str = "media") -> DataFrame:
    """Cheap JVM-side metadata: byte length + sha2 digest — no decode,
    usable for exact media dedup at scale."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(f"{media_col}.blob")).alias("n_bytes"),
        F.sha2(F.col(f"{media_col}.blob"), 256).alias("sha256"),
        F.col(f"{media_col}.mime").alias("mime"),
    )


def _fake_decode(blob: bytes, mime: str) -> dict:
    """Deterministic stand-in for a real decoder: derives pseudo
    dimensions + a feature vector from byte statistics."""
    if blob is None:
        raise ValueError("null blob")
    h = hashlib.sha256(blob).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "n_frames": 1 + h[2] % 8 if mime.startswith("video/") else 1,
        "features": [b / 255.0 for b in h[:8]],
    }


def decode_media(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    decoder: Callable[[bytes, str], dict] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode/feature-extract stage over ``mapInPandas``.

    Output: (id, width, height, n_frames, features array<double>,
    decode_error string). Per-item decoder exceptions are captured per
    row (C2 never-stop supervision parity), not task-fatal.

    A REAL decoder (PIL/ffmpeg) is not available in this container —
    raise ``NotImplementedError`` explicitly if the caller requests
    ``decoder="real"``; the default uses the deterministic fake.
    """
    if decoder == "real":  # type: ignore[comparison-overlap]
        raise NotImplementedError(
            "no codec libraries in this environment; pass a decoder callable"
        )
    fn = decoder or _fake_decode
    out_ddl = (
        f"{id_col} long, width int, height int, n_frames int, "
        "features array<double>, decode_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                m = rec["media"]
                blob = m["blob"] if isinstance(m, dict) else m.blob
                mime = m["mime"] if isinstance(m, dict) else m.mime
                row = {id_col: rec[id_col]}
                try:
                    d = fn(bytes(blob) if blob is not None else None, mime)
                    row.update(
                        width=d["width"],
                        height=d["height"],
                        n_frames=d["n_frames"],
                        features=d["features"],
                        decode_error=None,
                    )
                except Exception as e:
                    row.update(
                        width=None,
                        height=None,
                        n_frames=None,
                        features=None,
                        decode_error=f"{type(e).__name__}: {e}",
                    )
                out.append(row)
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(run, schema=out_ddl)


def resize_media(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    max_w: int = 32,
    max_h: int = 32,
    decoder: Callable[[bytes, str], dict] | None = None,
) -> DataFrame:
    """Decode + aspect-fit resize FUSED in one Arrow-batched
    ``mapInPandas`` pass — pixels never cross an executor boundary twice
    (the shape that matters at 100 TB: decode-then-shuffle-then-resize
    would move raw frames through an exchange).

    Target dims fit (w, h) into a ``max_w`` × ``max_h`` box preserving
    aspect ratio with integer floor division (exact, engine-portable);
    the resampler itself is the stubbed decode path, so the emitted
    ``resized_sha`` is sha256(blob || '|WxH') — a deterministic stand-in
    with the real data flow.
    """
    if decoder == "real":  # type: ignore[comparison-overlap]
        raise NotImplementedError(
            "no codec libraries in this environment; pass a decoder callable"
        )
    fn = decoder or _fake_decode
    out_ddl = (
        f"{id_col} long, width int, height int, out_w int, out_h int, "
        "resized_sha string, resize_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                m = rec["media"]
                blob = m["blob"] if isinstance(m, dict) else m.blob
                mime = m["mime"] if isinstance(m, dict) else m.mime
                row = {id_col: rec[id_col]}
                try:
                    d = fn(bytes(blob) if blob is not None else None, mime)
                    w, h = d["width"], d["height"]
                    # aspect-preserving fit: keep only when BOTH axes
                    # already fit; otherwise scale both by the limiting
                    # axis's ratio (integer floor, exact cross-engine)
                    if w <= max_w and h <= max_h:
                        ow, oh = w, h
                    elif w * max_h >= h * max_w:  # width-limited
                        ow = max_w
                        oh = max(1, h * max_w // w)
                    else:  # height-limited
                        oh = max_h
                        ow = max(1, w * max_h // h)
                    sha = hashlib.sha256(
                        bytes(blob) + f"|{ow}x{oh}".encode()
                    ).hexdigest()
                    row.update(
                        width=w, height=h, out_w=ow, out_h=oh,
                        resized_sha=sha, resize_error=None,
                    )
                except Exception as e:
                    row.update(
                        width=None, height=None, out_w=None, out_h=None,
                        resized_sha=None,
                        resize_error=f"{type(e).__name__}: {e}",
                    )
                out.append(row)
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(run, schema=out_ddl)


def frame_sample(
    decoded: DataFrame, id_col: str, every_n: int = 2
) -> DataFrame:
    """Frame-sampling plan for video media: one row per sampled frame
    index — pure expression (sequence + explode), the decode of each
    sampled frame is the (stubbed) decode stage's job."""
    return decoded.filter(F.col("n_frames") > 1).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def audio_chunks(
    media: DataFrame, id_col: str, media_col: str = "media"
) -> DataFrame:
    """Audio chunking plan: one row per 1-second window of the (pseudo)
    decoded waveform — the fixed-window segmentation stage a speech
    pipeline runs before per-chunk feature extraction (the real decode
    of each chunk is the stubbed decode stage's job, exactly like
    ``frame_sample`` for video).

    Pure JVM expressions end to end: the stand-in audio header
    (sample rate 8/12/16 kHz, 1-10 s duration + a partial tail) derives
    deterministically from sha256(blob) bytes — same spec style as
    ``_fake_decode`` — so window boundaries explode scan-side with no
    UDF and the whole plan is engine-mirrorable (oracle-checkable).
    """

    def byte(i: int):
        return F.conv(
            F.substring(F.sha2(F.col(f"{media_col}.blob"), 256), 2 * i + 1, 2),
            16,
            10,
        ).cast("int")

    sr = (F.lit(8000) + (byte(0) % 3) * 4000).alias("sample_rate")
    n_samples = (
        (F.lit(8000) + (byte(0) % 3) * 4000) * (1 + (byte(1) % 10))
        + (byte(2) % 997) * 7
    )
    base = media.select(
        F.col(id_col),
        sr,
        n_samples.alias("n_samples"),
    )
    return base.select(
        F.col(id_col),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_samples") - 1, F.col("sample_rate")
            )
        ).alias("start_sample"),
        "n_samples",
    ).select(
        F.col(id_col),
        "sample_rate",
        F.expr("start_sample DIV sample_rate").alias("chunk_idx"),
        F.least(
            F.col("sample_rate"),
            F.col("n_samples") - F.col("start_sample"),
        )
        .cast("long")
        .alias("n_in_chunk"),
    )
