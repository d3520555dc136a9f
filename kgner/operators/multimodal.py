"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step is STUBBED (no image/audio libs in this container): decoding
dispatches to `_decode_image_real` which raises NotImplementedError unless a
deterministic fake is requested. Everything around it — schema, Arrow batch
shape, size-capped mapInPandas, partitioning — is real and tested, so wiring
a real decoder is a one-function change.

Scale notes: media rows are BIG; `mapInPandas` re-chunks each incoming Arrow
batch by cumulative payload bytes (max_batch_bytes) so one batch of giant
blobs cannot blow executor memory — the same byte-cap trick the text path
uses for giant pages (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = "media_id bigint, kind string, n_bytes int, feature array<float>"


def _decode_image_real(payload: bytes) -> "np.ndarray":
    raise NotImplementedError(
        "image decode requires PIL/libvips — not present in this container; "
        "use deterministic_fake=True for the tested fake path"
    )


def _decode_fake(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decode': md5 bytes -> pseudo feature vector."""
    h = hashlib.md5(payload or b"").digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (arr % 1000).astype(np.float32) / 1000.0


def extract_media_features(
    media: DataFrame,
    max_batch_bytes: int = 64 * 1024 * 1024,
    deterministic_fake: bool = True,
    feature_dim: int = 16,
) -> DataFrame:
    """media table -> (media_id, kind, n_bytes, feature array<float>).

    Byte-capped Arrow batching: each pandas batch is re-split so cumulative
    payload size stays under max_batch_bytes before any decode happens.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def flush(rows: list[dict]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "media_id": pd.Series([r["media_id"] for r in rows], dtype="int64"),
                    "kind": pd.Series([r["kind"] for r in rows], dtype="object"),
                    "n_bytes": pd.Series([r["n_bytes"] for r in rows], dtype="int32"),
                    "feature": pd.Series([r["feature"] for r in rows], dtype="object"),
                }
            )

        for pdf in batches:
            rows: list[dict] = []
            acc = 0
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                if deterministic_fake:
                    feat = _decode_fake(payload, feature_dim)
                else:
                    feat = _decode_image_real(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": str(kind),
                        "n_bytes": len(payload),
                        "feature": feat.tolist(),
                    }
                )
                acc += len(payload)
                if acc >= max_batch_bytes:
                    yield flush(rows)
                    rows, acc = [], 0
            if rows:
                yield flush(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


CAPTIONS_SCHEMA = "media_id bigint, caption string, ocr_text string"


def media_captions(
    media: DataFrame,
    max_batch_bytes: int = 64 * 1024 * 1024,
    deterministic_fake: bool = True,
    ocr_tokens: int = 5,
) -> DataFrame:
    """media -> (media_id, caption, ocr_text): the ITA text-extraction step
    (ITA/README.md: VinVL image captions + Tesseract OCR texts are extracted
    per image and aligned into the textual context). Both extractors are
    STUBBED deterministically (the models/libs are absent): caption is
    metadata-derived ('image WxH of N bytes md5 xxxxxxxx'), OCR is the first
    `ocr_tokens` whitespace tokens of the payload decoded as UTF-8,
    lowercased. The Spark plumbing — byte-capped Arrow batches, schema,
    per-row extraction seam — is real; swapping in VinVL/Tesseract is a
    two-function change."""
    import re

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def flush(rows: list[tuple]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "media_id": pd.Series([r[0] for r in rows], dtype="int64"),
                    "caption": pd.Series([r[1] for r in rows], dtype="object"),
                    "ocr_text": pd.Series([r[2] for r in rows], dtype="object"),
                }
            )

        for pdf in batches:
            rows: list[tuple] = []
            acc = 0
            for mid, payload, width, height in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if not pd.notna(mid):
                    # a media row without an id can never join back to a
                    # query (ita_contexts joins on media_id) — drop it rather
                    # than alias distinct null-id rows onto a sentinel value
                    continue
                payload = bytes(payload) if payload is not None else b""
                if not deterministic_fake:
                    raise NotImplementedError(
                        "caption/OCR need VinVL/Tesseract — absent here; "
                        "deterministic_fake=True is the tested path"
                    )
                digest = hashlib.md5(payload).hexdigest()[:8]
                # metadata columns are nullable ints — 0 is the explicit
                # "unknown dimension" in the caption, same policy as b""
                w = int(width) if pd.notna(width) else 0
                hgt = int(height) if pd.notna(height) else 0
                caption = (
                    f"image {w}x{hgt} of {len(payload)} bytes md5 {digest}"
                )
                text = payload.decode("utf-8", "replace").strip()
                toks = re.split(r"[ \t\n\r\f\v]+", text) if text else [""]
                ocr = " ".join(toks[:ocr_tokens]).lower()
                rows.append((int(mid), caption, ocr))
                acc += len(payload)
                if acc >= max_batch_bytes:
                    yield flush(rows)
                    rows, acc = [], 0
            if rows:
                yield flush(rows)

    return media.select("media_id", "payload", "width", "height").mapInPandas(
        run, CAPTIONS_SCHEMA
    )


def ita_contexts(media_links: DataFrame, captions: DataFrame) -> DataFrame:
    """media_links(query_id, media_id, rank) x captions(media_id, caption,
    ocr_text) -> (query_id, rank, sentence) ranked contexts for
    kgner.operators.context.assemble_context: for image rank r the caption
    lands at 2r-1 and the OCR text at 2r (captions precede OCR per image —
    ITA feeds captions, object labels, then OCR into the textual context).
    This is the routing step that makes image-derived text participate in
    the SAME subtoken-budget loop as retrieved sentence contexts."""
    from pyspark.sql import functions as F

    j = media_links.join(captions, "media_id")
    cap = j.select(
        "query_id",
        ((F.col("rank") - 1) * 2 + 1).cast("int").alias("rank"),
        F.col("caption").alias("sentence"),
    )
    ocr = j.select(
        "query_id",
        ((F.col("rank") - 1) * 2 + 2).cast("int").alias("rank"),
        F.col("ocr_text").alias("sentence"),
    )
    return cap.unionByName(ocr)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into the frame
    timestamps a decoder would extract (decode itself stubbed). Pure JVM."""
    from pyspark.sql import functions as F

    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
