"""Multimodal columns: opaque binary payloads + typed metadata.

The reference ingests arbitrary file bytes and runs format-specific
extractors over them (Docling/Azure/AWS providers,
``/root/reference/app/providers/docling_provider.py:80-317`` — 20 formats in,
text + metadata out). At lake scale the same shape is: an opaque ``binary``
column plus typed metadata columns, with decode / feature-extraction /
resize / frame-sampling as Arrow-batched pandas functions over
``mapInPandas``.

The image/audio decode libraries are not in this container, so the decode
step is STUBBED: if PIL/soundfile are importable they are used; otherwise a
clearly-marked deterministic fake derives metadata from the byte content.
The Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the image-decode stage
IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, "
    "channels int, decoder string"
)

#: output schema of frame sampling (one row per sampled frame)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, frame_sha string"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of a text column —
    stand-in for real image/audio blobs; the plumbing is type-faithful)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def binary_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cheap metadata with builtins only (no Python): size + content hash.
    This is the always-on path — decode stubs below are the opt-in path."""
    return df.select(
        F.col(id_col),
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("content_sha"),
    )


def _fake_dims(data: bytes) -> tuple[str, int, int, int]:
    """Deterministic fake decode: metadata derived from the byte content.
    STUB — replace with a real decoder when PIL is available."""
    h = hashlib.md5(data).digest()
    return (
        ["png", "jpeg", "webp"][h[0] % 3],
        64 + h[1] % 192,  # width
        64 + h[2] % 192,  # height
        [1, 3, 4][h[3] % 3],
    )


def decode_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode the binary payload to image metadata via mapInPandas.

    Arrow-batched: each pandas batch decodes vectorized-per-row in one Python
    call frame (the per-row work is the decoder itself, as it must be).
    Partitioning: inherits the scan's partitions; for real corpora
    repartition by a size-bucketed key first so huge blobs don't skew tasks.
    """
    try:  # real decoder when available
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if have_pil:
                    try:
                        from PIL import Image

                        img = Image.open(io.BytesIO(data))
                        rows.append(
                            (doc_id, len(data), (img.format or "?").lower(),
                             img.width, img.height, len(img.getbands()), "pil")
                        )
                        continue
                    except Exception:  # noqa: BLE001 - not a real image
                        pass
                fmt, w, h, c = _fake_dims(data)
                rows.append((doc_id, len(data), fmt, w, h, c, "stub"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "format", "width", "height",
                         "channels", "decoder"],
            )

    return df.select(id_col, "payload").mapInPandas(decode, IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Video-style frame sampling: N evenly spaced 'frames' per payload.

    STUB decoder — frames are byte slices; the output shape (explode to one
    row per frame, deterministic timestamps, content hash per frame) is the
    real contract a training-data pipeline consumes.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                dur_ms = max(len(data), 1)  # fake: 1 byte ~ 1 ms
                for i in range(n_frames):
                    ts = (i * dur_ms) // n_frames
                    lo = (i * len(data)) // n_frames
                    hi = ((i + 1) * len(data)) // n_frames
                    sha = hashlib.sha256(data[lo:hi]).hexdigest()
                    rows.append((doc_id, i, ts, sha))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_sha"]
            )

    return df.select(id_col, "payload").mapInPandas(sample, FRAME_SCHEMA)
