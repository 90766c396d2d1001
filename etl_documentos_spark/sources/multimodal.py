"""Multimodal columns: opaque binary payloads + typed metadata.

The reference ingests arbitrary file bytes and runs format-specific
extractors over them (Docling/Azure/AWS providers,
``/root/reference/app/providers/docling_provider.py:80-317`` — 20 formats in,
text + metadata out). At lake scale the same shape is: an opaque ``binary``
column plus typed metadata columns, with decode / feature-extraction /
resize / frame-sampling as Arrow-batched pandas functions over
``mapInPandas``.

Decoder reality, by format:

- **BMP and WAV are decoded for REAL** (``decode_bmp`` / ``decode_wav``):
  uncompressed BMP is a fixed little-endian header + raster (numpy parses
  it stride/padding-aware) and WAV ships with stdlib ``wave`` — so two
  genuine byte-level decode paths run end-to-end in this container, with
  synthesizers (``synth_bmp_payload`` / ``synth_wav_payload``) producing
  bit-valid payloads whose decoded values a SQL oracle can predict.
- JPEG/PNG/WebP decode libraries (PIL) are not in this container, so
  ``decode_images`` uses PIL when importable and otherwise a clearly-marked
  deterministic fake. The Spark-side plumbing — schema, batch iteration,
  partitioning, UDF signatures — is real and tested either way.
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


def decode_images(
    df: DataFrame, id_col: str = "doc_id", force_stub: bool = False
) -> DataFrame:
    """Decode the binary payload to image metadata via mapInPandas.

    Arrow-batched: each pandas batch decodes vectorized-per-row in one Python
    call frame (the per-row work is the decoder itself, as it must be).
    Partitioning: inherits the scan's partitions; for real corpora
    repartition by a size-bucketed key first so huge blobs don't skew tasks.
    ``force_stub=True`` pins the deterministic fake decoder even when PIL is
    importable — the oracle-checked query uses it so the expected values
    don't depend on which decode libraries the container happens to ship.
    """
    if force_stub:
        have_pil = False
    else:
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


#: real-decode output schemas (see synth_*/decode_* below)
BMP_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, sum_pixels long"
)
WAV_META_SCHEMA = (
    "doc_id long, n_channels int, sample_rate int, n_samples int, "
    "duration_ms long, sum_samples long"
)


def synth_bmp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL (bit-valid) 24-bit uncompressed BMP per row, generated
    deterministically from the id: width = 16 + id%32, height = 8 + id%16,
    pixel(x, y) = (id + x + y) % 256 on all three channels. This gives the
    decode stage genuine bytes to parse end-to-end — no image libraries
    needed on either side (BMP is a fixed little-endian header + raster).
    """
    import struct

    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for i in ids:
            i = int(i)
            w, h = 16 + i % 32, 8 + i % 16
            row_len = (3 * w + 3) & ~3  # rows padded to 4 bytes
            x = np.arange(w)
            rows = []
            # BMP rasters are bottom-up
            for y in range(h - 1, -1, -1):
                vals = ((i + x + y) % 256).astype(np.uint8)
                row = np.repeat(vals, 3)  # B=G=R
                rows.append(
                    np.pad(row, (0, row_len - 3 * w)).tobytes()
                )
            raster = b"".join(rows)
            header = struct.pack(
                "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
            ) + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                2835, 2835, 0, 0,
            )
            out.append(header + raster)
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


def decode_bmp(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL BMP decode over mapInPandas: parse the header, reconstruct the
    pixel raster with numpy (stride/padding-aware), emit dimensions and the
    exact integer pixel sum (cross-engine-stable, unlike rounded float means). No stub — wrong bytes raise."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if data[:2] != b"BM":
                    raise ValueError(f"not a BMP payload for id {doc_id}")
                off = int.from_bytes(data[10:14], "little")
                w = int.from_bytes(data[18:22], "little", signed=True)
                h = int.from_bytes(data[22:26], "little", signed=True)
                bpp = int.from_bytes(data[28:30], "little")
                ch = bpp // 8
                row_len = (ch * w + 3) & ~3
                raster = np.frombuffer(
                    data, np.uint8, count=row_len * abs(h), offset=off
                ).reshape(abs(h), row_len)
                pixels = raster[:, : ch * w]
                rows.append(
                    (doc_id, w, abs(h), ch, int(pixels.sum(dtype="int64")))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels",
                         "sum_pixels"],
            )

    return df.select(id_col, "payload").mapInPandas(decode, BMP_META_SCHEMA)


def synth_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL RIFF/WAVE payload per row (stdlib ``wave`` writer):
    mono, 16-bit, 8 kHz, n = 100 + id%50 samples with
    sample(i) = ((id*31 + i*7) % 2003) - 1001."""
    import io
    import wave

    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for i in ids:
            i = int(i)
            n = 100 + i % 50
            samples = (
                (i * 31 + np.arange(n) * 7) % 2003 - 1001
            ).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(2)
                wv.setframerate(8000)
                wv.writeframes(samples.tobytes())
            out.append(buf.getvalue())
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


def decode_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL WAV decode over mapInPandas (stdlib ``wave`` + numpy): channel
    count, sample rate, frame count, duration and the exact sample sum."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(data)), "rb") as wv:
                    nch = wv.getnchannels()
                    rate = wv.getframerate()
                    n = wv.getnframes()
                    samples = np.frombuffer(
                        wv.readframes(n), dtype="<i2"
                    )
                rows.append(
                    (doc_id, nch, rate, n, (n * 1000) // rate,
                     int(samples.sum(dtype="int64")))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_channels", "sample_rate", "n_samples",
                         "duration_ms", "sum_samples"],
            )

    return df.select(id_col, "payload").mapInPandas(decode, WAV_META_SCHEMA)


PNG_META_SCHEMA = (
    "doc_id long, width int, height int, bit_depth int, color_type int, "
    "sum_pixels long"
)


def _paeth(a, b, c):
    """PNG Paeth predictor (RFC 2083 §6.6), vectorized over numpy arrays."""
    import numpy as np

    p = a.astype("int32") + b.astype("int32") - c.astype("int32")
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype("uint8")


def synth_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL (spec-valid) 8-bit grayscale PNG per row, stdlib-only
    (zlib for IDAT + CRCs, no image libraries): width = 16 + id%32,
    height = 8 + id%16, pixel(x, y) = (id + x + y) % 256, top-down.

    Each scanline uses filter type (id + y) % 5 — None/Sub/Up/Average/
    Paeth all appear, so the decoder must implement the full un-filtering
    algorithm (not just strip a zero byte) to reproduce the pixel sum the
    oracle predicts. Filtering is lossless and any per-line choice is valid
    PNG, so the payloads also open in any standard viewer.
    """
    import struct
    import zlib

    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def make(ids: pd.Series) -> pd.Series:
        import numpy as np

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        out = []
        for i in ids:
            i = int(i)
            w, h = 16 + i % 32, 8 + i % 16
            x = np.arange(w)
            prior = np.zeros(w, dtype="uint8")
            lines = []
            for y in range(h):
                raw = ((i + x + y) % 256).astype("uint8")
                ft = (i + y) % 5
                left = np.concatenate(([0], raw[:-1])).astype("uint8")
                pl = np.concatenate(([0], prior[:-1])).astype("uint8")
                if ft == 0:
                    filt = raw
                elif ft == 1:  # Sub
                    filt = raw - left
                elif ft == 2:  # Up
                    filt = raw - prior
                elif ft == 3:  # Average
                    filt = raw - (
                        (left.astype("int32") + prior.astype("int32")) // 2
                    ).astype("uint8")
                else:  # Paeth
                    filt = raw - _paeth(left, prior, pl)
                lines.append(bytes([ft]) + filt.tobytes())
                prior = raw
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            out.append(
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + chunk(b"IEND", b"")
            )
        return pd.Series(out)

    return df.withColumn("payload", make(F.col(id_col)))


def decode_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PNG decode over mapInPandas, stdlib zlib + numpy only: walk the
    chunk stream, parse IHDR, inflate the concatenated IDAT data, undo all
    five scanline filters (None/Sub/Up/Average/Paeth per RFC 2083), emit
    dimensions and the exact integer pixel sum. 8-bit grayscale
    (color type 0) is supported — the synthetic corpus shape; other color
    types raise rather than silently mis-decode. No stub in this path."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf["payload"]):
                data = bytes(data)
                if data[:8] != b"\x89PNG\r\n\x1a\n":
                    raise ValueError(f"not a PNG payload for id {doc_id}")
                pos, idat = 8, []
                w = h = depth = ctype = None
                while pos < len(data):
                    (ln,) = struct.unpack(">I", data[pos:pos + 4])
                    tag = data[pos + 4:pos + 8]
                    body = data[pos + 8:pos + 8 + ln]
                    if tag == b"IHDR":
                        w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
                    elif tag == b"IDAT":
                        idat.append(body)
                    elif tag == b"IEND":
                        break
                    pos += 12 + ln
                if ctype != 0 or depth != 8:
                    raise ValueError(
                        f"unsupported PNG (color_type={ctype}, "
                        f"depth={depth}) for id {doc_id}"
                    )
                raw = zlib.decompress(b"".join(idat))
                stride = w + 1
                prior = np.zeros(w, dtype="uint8")
                total = 0
                for y in range(h):
                    line = raw[y * stride:(y + 1) * stride]
                    ft = line[0]
                    cur = np.frombuffer(line, np.uint8, count=w, offset=1)
                    if ft == 0:
                        rec = cur.copy()
                    elif ft == 2:  # Up
                        rec = cur + prior
                    else:  # Sub/Average/Paeth need the running left pixel
                        rec = np.zeros(w, dtype="uint8")
                        left = 0
                        pl = 0
                        for xx in range(w):
                            up = int(prior[xx])
                            if ft == 1:
                                val = int(cur[xx]) + left
                            elif ft == 3:
                                val = int(cur[xx]) + (left + up) // 2
                            elif ft == 4:
                                p = left + up - pl
                                pa = abs(p - left)
                                pb = abs(p - up)
                                pc = abs(p - pl)
                                if pa <= pb and pa <= pc:
                                    pred = left
                                elif pb <= pc:
                                    pred = up
                                else:
                                    pred = pl
                                val = int(cur[xx]) + pred
                            else:
                                raise ValueError(f"bad filter {ft}")
                            rec[xx] = val & 0xFF
                            left, pl = int(rec[xx]), up
                    total += int(rec.sum(dtype="int64"))
                    prior = rec
                rows.append((doc_id, w, h, depth, ctype, total))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "bit_depth",
                         "color_type", "sum_pixels"],
            )

    return df.select(id_col, "payload").mapInPandas(decode, PNG_META_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Video-style frame sampling: N evenly spaced 'frames' per payload.

    STUB decoder — frames are byte slices; the output shape (explode to one
    row per frame, deterministic timestamps, content hash per frame) is the
    real contract a training-data pipeline consumes.

    The per-frame content hash is sha256 over the UPPERCASE HEX of the byte
    slice (not the raw bytes): DuckDB's sha256 only accepts VARCHAR, and an
    arbitrary byte slice of utf-8 text can split a multibyte character, so
    hashing in the hex domain is what lets a SQL oracle recompute the exact
    value (``sha256(substr(hex(encode(text)), 2*lo+1, 2*(hi-lo)))``) while
    the engine still slices genuine bytes.
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
                    sha = hashlib.sha256(
                        data[lo:hi].hex().upper().encode()
                    ).hexdigest()
                    rows.append((doc_id, i, ts, sha))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_sha"]
            )

    return df.select(id_col, "payload").mapInPandas(sample, FRAME_SCHEMA)
