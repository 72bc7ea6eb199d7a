"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
per the large-scale training-data pattern: the *Spark-side plumbing*
(schema, Arrow batch shape, partition-sized mapInPandas feature
extraction) is real and tested; the actual media decode is stubbed
because codec libraries are not available in this environment.

At scale: feature extraction is mapInPandas over size-controlled
partitions (spark.sql.files.maxPartitionBytes bounds the bytes a task
holds), so memory per executor is predictable for multi-MB payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("id bigint, n_bytes int, sha string, "
                  "feature array<float>")


def pack_binary(df: DataFrame, payload_col: str, id_col: str,
                media_type: str = "application/octet-stream") -> DataFrame:
    """Wrap a column as (id, payload: binary, meta struct). For string
    input the payload is its UTF-8 encoding."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"))


def decode_media(payload: bytes, media_type: str):
    """Real decode entry point — intentionally unimplemented here.

    Production wiring: PIL / torchaudio / PyAV inside the same
    mapInPandas batch loop used by extract_features.
    """
    raise NotImplementedError(
        f"media decode for {media_type!r} requires codec libraries not "
        "present in this environment")


def _fake_feature(batch: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic stand-in for an embedding model: byte-histogram
    moments, vectorized over the batch (shape [n, dim] float32)."""
    out = np.zeros((len(batch), dim), dtype=np.float32)
    for i, b in enumerate(batch):  # bounded by Arrow batch size
        a = np.frombuffer(b or b"", dtype=np.uint8)
        if a.size == 0:
            continue
        h = np.bincount(a % dim, minlength=dim).astype(np.float32)
        out[i] = h / a.size
    return out


def extract_features(packed: DataFrame, dim: int = 16,
                     use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    (id, payload, meta) -> (id, n_bytes, sha, feature). With
    use_real_decoder=True this calls decode_media (NotImplementedError
    here); the deterministic fake keeps the pipeline testable.
    """
    def run(batches):
        import hashlib
        for pdf in batches:
            payloads = pdf["payload"].to_numpy()
            if use_real_decoder:
                for p in payloads:
                    decode_media(p, "application/octet-stream")
            feats = _fake_feature(payloads, dim)
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(),
                "n_bytes": [len(p or b"") for p in payloads],
                "sha": [hashlib.sha256(p or b"").hexdigest() for p in payloads],
                "feature": list(feats),
            })

    return packed.mapInPandas(run, schema=FEATURE_SCHEMA)
