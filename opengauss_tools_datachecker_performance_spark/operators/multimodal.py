"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with typed
metadata structs; decode/resize/frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` — the Spark-side plumbing
(schemas, batch iteration, partition alignment) is real and tested;
the actual codec call is STUBBED (this container has no image/audio
libraries) behind ``_decode_stub``: a deterministic fake that derives
"pixel stats" from the payload bytes, or ``NotImplementedError`` when
``strict=True``.

Scale notes: binary payloads dominate bytes, so every transform here
(a) projects metadata-only columns wherever the payload isn't needed
(column pruning keeps payload I/O out of those scans entirely) and
(b) processes payloads streaming per Arrow batch — nothing holds a
partition's payloads in memory at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: asset table schema: catalog row + opaque payload
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = (
    "media_ref string, mime string, n_bytes long, width int, height int, "
    "mean_luma double, feature array<float>"
)


def synth_payloads(assets: DataFrame, payload_bytes: int = 256) -> DataFrame:
    """Attach a deterministic fake binary payload to an asset catalog
    (repeat of the md5 of the ref, truncated) — enough to exercise the
    binary-column path without real media."""
    reps = payload_bytes // 16 + 1
    # repeat/substring operate on the hex STRING form; unhex happens last
    # (string ops on a binary column would implicitly cast through UTF-8
    # and mangle the bytes).
    return assets.withColumn(
        "payload",
        F.unhex(
            F.substring(F.repeat(F.md5(F.col("media_ref")), reps), 1, payload_bytes * 2)
        ),
    )


def _decode_stub(payload: bytes, mime: str) -> dict:
    """Deterministic fake decoder. Replace with PIL/libav in a real
    deployment; the signature and batch shape are the contract."""
    if payload is None:
        return {"width": 0, "height": 0, "mean_luma": 0.0}
    w = 16 + payload[0] % 64 if len(payload) else 16
    h = 16 + payload[-1] % 64 if len(payload) else 16
    luma = (sum(payload[:64]) / max(1, len(payload[:64]))) / 255.0
    return {"width": int(w), "height": int(h), "mean_luma": float(luma)}


def extract_features(
    assets_with_payload: DataFrame, strict: bool = False, feat_dim: int = 8
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    ``strict=True`` raises NotImplementedError exactly where a real
    codec would be invoked — marking the stub boundary explicitly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "media decode requires an image/audio codec library; "
                    "this environment ships none — plug one in here"
                )
            decoded = [
                _decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "mean_luma": [d["mean_luma"] for d in decoded],
                    "feature": [
                        [
                            float((d["width"] * (i + 1) + d["height"]) % 97) / 97.0
                            for i in range(feat_dim)
                        ]
                        for d in decoded
                    ],
                }
            )
            yield out

    return assets_with_payload.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plan for video-ish payloads: emits (media_ref,
    frame_idx, byte_offset) rows WITHOUT touching payloads — a pure
    metadata computation (pushdown-friendly), the decode of each frame
    being a later payload-projected mapInPandas pass."""
    n_frames = F.least(
        F.greatest((F.col("bytes") / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return assets.select(
        "media_ref",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
    ).select(
        "media_ref",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )


RESIZE_SCHEMA = (
    "media_ref string, mime string, src_bytes long, target_w int, "
    "target_h int, out_bytes long, out_digest string"
)


def resize_media(
    assets_with_payload: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Resize plumbing: Arrow-batched ``mapInPandas`` over binary
    payloads — the slot where a real scaler (PIL / libav) runs per
    payload at production. The stub "resize" is deterministic AND
    SQL-replicable so the catalog entry stays oracle-checked: the
    resized payload is the first ``1 + target_w*target_h//32`` bytes
    of the source (capped at its length) and ``out_digest`` is the md5
    of that prefix's lowercase-hex rendering. ``strict=True`` raises
    exactly at the codec boundary, like ``extract_features``.

    Payloads stream per Arrow batch and only the digest + dims leave
    the executor — the resized bytes themselves would be written to a
    sink column in a real pipeline, never collected."""
    import hashlib

    k = 1 + (target_w * target_h) // 32

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "media resize requires an image/audio codec library; "
                    "this environment ships none — plug one in here"
                )
            src_bytes = [len(p) if p is not None else 0 for p in pdf["payload"]]
            resized = [
                (p or b"")[: min(n, k)] for p, n in zip(pdf["payload"], src_bytes)
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "mime": pdf["mime"],
                    "src_bytes": src_bytes,
                    "target_w": target_w,
                    "target_h": target_h,
                    "out_bytes": [len(r) for r in resized],
                    "out_digest": [
                        hashlib.md5(r.hex().encode()).hexdigest() for r in resized
                    ],
                }
            )

    return assets_with_payload.mapInPandas(batches, schema=RESIZE_SCHEMA)
