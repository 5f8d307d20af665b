"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real Spark-side machinery (schema, batching, partitioning) with the
codec import-guarded: when Pillow is importable the decode/resize paths
run the real library; otherwise a deterministic fake decoder runs behind
the same ``mapInPandas`` interface. Payloads that are NOT decodable
images (e.g. the synthetic text-derived blobs in the testdata) always
take the deterministic fallback, so oracle results are identical in
both modes — the PIL path only activates on genuine image bytes.

Column convention (SURVEY.md §1.2): payload ``BINARY`` + ``mime STRING``
+ per-modality metadata struct — the broker's opaque-bytes model
(record body, internal/producing/models.go:146-154) upgraded with types.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # the package zip ships to workers, so this evaluates there too
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, nbytes int, width int, height int, mean_luma double"
)


def attach_blob(df: DataFrame, id_col: str, payload_col: str,
                mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a column as an opaque binary payload with MIME + size metadata."""
    return df.select(
        F.col(id_col),
        F.to_binary(F.col(payload_col), F.lit("utf-8")).alias("blob"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.to_binary(F.col(payload_col), F.lit("utf-8"))).alias("nbytes"),
    )


def _fake_decode(blob: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder: derives (width,
    height, mean luma) from the payload bytes — the fallback when Pillow
    is absent or the payload isn't a decodable image."""
    if not blob:
        return 0, 0, 0.0
    width = 64 + blob[0] % 192
    height = 64 + blob[-1] % 192
    mean_luma = (sum(blob[:64]) / min(len(blob), 64)) / 255.0
    return width, height, mean_luma


def _decode(blob: bytes) -> tuple[int, int, float]:
    """Real decode when possible (PIL importable + payload decodes),
    deterministic fake otherwise."""
    if HAS_PIL and blob:
        import io

        try:
            with _PILImage.open(io.BytesIO(blob)) as im:
                gray = im.convert("L")
                hist = gray.histogram()
                npx = gray.width * gray.height
                luma = sum(i * c for i, c in enumerate(hist)) / (npx * 255.0)
                return im.width, im.height, luma
        except Exception:  # noqa: BLE001 — not an image: fall through
            pass
    return _fake_decode(blob)


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          blob_col: str = "blob") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches through the decoder — at
    100 TB each task decodes its own partition's blobs; no shuffle, and
    batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[blob_col].map(_decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf.get("mime", "application/octet-stream"),
                    "nbytes": pdf[blob_col].map(len),
                    "width": feats.map(lambda t: t[0]),
                    "height": feats.map(lambda t: t[1]),
                    "mean_luma": feats.map(lambda t: t[2]),
                }
            )
            yield out

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_sig string"
RESIZE_SCHEMA = "doc_id bigint, width int, height int, resized binary, resized_nbytes int"


def frame_sample(
    df: DataFrame, id_col: str, blob_col: str, every_nth: int = 4
) -> DataFrame:
    """Video-style frame sampling over binary payloads via mapInPandas.

    STUB CODEC (deterministic fake — no ffmpeg in this container): frame
    count is derived from the payload length (``1 + nbytes % 61``) and
    each sampled frame yields an md5-derived signature. The Spark-side
    plumbing is the real thing a production ffmpeg UDF plugs into: one
    input row fans out to N per-frame rows inside the Arrow batch, tasks
    decode only their own partition's blobs, no shuffle."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                n_frames = 1 + len(blob) % 61
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    sigs.append(
                        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sig": sigs}
            )

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


def resize_images(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image resize over binary payloads via mapInPandas.

    Import-guarded codec: with Pillow present AND a decodable image
    payload, the real ``Image.open(...).resize((width, height))`` runs
    and yields PNG bytes; otherwise (no PIL, or payload isn't an image —
    all synthetic testdata blobs) the "resized" payload is the
    deterministic md5 digest of the original bytes. Batch shape, schema,
    and partitioning are identical in both modes."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def one(b: bytes) -> bytes:
            if HAS_PIL and b:
                import io

                try:
                    with _PILImage.open(io.BytesIO(b)) as im:
                        buf = io.BytesIO()
                        im.resize((width, height)).save(buf, format="PNG")
                        return buf.getvalue()
                except Exception:  # noqa: BLE001 — not an image
                    pass
            return hashlib.md5(b).digest()

        for pdf in batches:
            resized = pdf[blob_col].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": resized,
                    "resized_nbytes": resized.map(len),
                }
            )

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = "doc_id bigint, window_idx int, n_samples int, energy bigint, peak int"


def audio_window_energy(
    df: DataFrame, id_col: str, blob_col: str, window: int = 256
) -> DataFrame:
    """Audio feature extraction over binary payloads via mapInPandas.

    STUB CODEC (deterministic — no soundfile/librosa in this container):
    the payload bytes are read as unsigned 8-bit PCM recentered to
    [-128, 127]; a real decoder plugs into the same Arrow-batch
    interface with only ``np.frombuffer`` swapped out. Per
    non-overlapping ``window``-sample frame: integer energy (sum of
    squares) and peak |amplitude| — integers so the DuckDB oracle
    compares bit-exactly, mirroring the RMS/peak features a real audio
    curation pass computes.

    Scale: one Python iteration per document (payloads are ragged), with
    the per-window reduction fully numpy-vectorized (zero-pad to a
    window multiple, reshape (n_windows, window), reduce along axis 1 —
    zero padding is identity for both sum-of-squares and abs-max); one
    row fans out to its frames inside the task, no shuffle.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, w_idx, n_s, energy, peak = [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                samples = (
                    np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
                    - 128
                )
                n = len(samples)
                if n == 0:
                    continue
                nwin = -(-n // window)
                padded = np.zeros(nwin * window, dtype=np.int64)
                padded[:n] = samples
                seg = padded.reshape(nwin, window)
                ids.append(np.full(nwin, doc_id, dtype=np.int64))
                w_idx.append(np.arange(nwin, dtype=np.int64))
                counts = np.full(nwin, window, dtype=np.int64)
                counts[-1] = n - (nwin - 1) * window
                n_s.append(counts)
                energy.append((seg * seg).sum(axis=1))
                peak.append(np.abs(seg).max(axis=1))
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "window_idx": np.concatenate(w_idx),
                    "n_samples": np.concatenate(n_s),
                    "energy": np.concatenate(energy),
                    "peak": np.concatenate(peak),
                }
            )

    return df.mapInPandas(feats, schema=AUDIO_SCHEMA)
