"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
input table's ``html: binary`` is the same pattern (never parsed by the
dedup pipeline). The Spark-side plumbing here is real and tested: schema,
Arrow batch shape, partition sizing, mapInPandas iteration; the actual
codec work is stubbed because no image/audio libraries ship in this
container.

Design notes for 100 TB of media:
- decode/resize/frame-sample are embarrassingly parallel map-side work —
  mapInPandas over batches whose size is bounded by bytes, not rows
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` + input split sizing);
- features (not raw media) flow into the similarity joins (embedding-cosine
  near-dup via operators/similarity.py), so shuffles never carry blobs;
- binary columns stay out of every groupBy/join key.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, content binary, "
    "meta_width int, meta_height int, meta_duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, feature array<float>, "
    "decode_ok boolean"
)


def _image_codec():
    """Optional codec import — PIL when installed, else None. This
    container ships no codec libraries, so here the stub path is live; on
    a cluster image with Pillow the real path activates with no code
    change."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_media(content: bytes, modality: str) -> np.ndarray:
    """Decode a media payload to a numpy array.

    Image payloads decode through PIL when it is importable; every other
    (modality, available-codec) combination raises NotImplementedError —
    an honest stub, not a silent fake."""
    if modality.startswith("image"):
        Image = _image_codec()
        if Image is not None:
            import io  # noqa: PLC0415

            with Image.open(io.BytesIO(content)) as img:
                return np.asarray(img.convert("L"))
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg-class libraries not shipped in "
        "this environment; use deterministic_fake=True for plumbing tests"
    )


def extract_features(
    media: DataFrame, feature_dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """media → (media_id, modality, n_bytes, feature array<float>).

    With ``deterministic_fake`` the 'decoder' derives a feature vector from
    a seeded hash of the bytes — stable across runs/partitionings, so the
    downstream similarity plumbing is fully testable. With it off, images
    decode for real when PIL is importable (feature = normalized
    ``feature_dim``-bin intensity histogram); rows whose payload fails to
    decode come back with ``decode_ok = false`` and a NULL feature —
    drop-accounted, never silently invented. A missing codec library (the
    state of this container) still raises NotImplementedError.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list[list[float] | None] = []
            ok: list[bool] = []
            for content, modality in zip(pdf["content"], pdf["modality"]):
                b = bytes(content) if content is not None else b""
                if deterministic_fake:
                    seed = np.frombuffer(
                        np.array([hash_bytes(b)], dtype=np.uint64).tobytes(), dtype=np.uint32
                    )[0]
                    rng = np.random.RandomState(int(seed))
                    feats.append(rng.standard_normal(feature_dim).astype(np.float32).tolist())
                    ok.append(True)
                else:
                    try:
                        pixels = decode_media(b, modality)
                    except NotImplementedError:
                        raise  # no codec at all: honest stub, fail loudly
                    except Exception:
                        feats.append(None)  # corrupt payload: drop-account
                        ok.append(False)
                        continue
                    hist, _ = np.histogram(
                        pixels.astype(np.float64), bins=feature_dim, range=(0, 256)
                    )
                    total = max(int(hist.sum()), 1)
                    feats.append((hist / total).astype(np.float32).tolist())
                    ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda c: len(c) if c is not None else 0),
                    "feature": feats,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def hash_bytes(b: bytes) -> int:
    """FNV-1a 64 of raw bytes (deterministic fake-decoder seed)."""
    h = 0xCBF29CE484222325
    for byte in b[:4096]:  # cap: seeding doesn't need the whole blob
        h = ((h ^ byte) * 0x100000001B3) % 2**64
    return h


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes metadata through, marks content transformed.

    The real kernel is a per-batch vectorized decode→resize→encode; the stub
    keeps schema and batch shape so pipelines composing it stay testable."""
    return media.withColumns(
        {"meta_width": F.lit(width), "meta_height": F.lit(height)}
    )
