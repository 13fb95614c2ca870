"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The container has no image/audio libraries, so
the actual codecs are STUBBED: ``decode_image`` raises
NotImplementedError unless Pillow is importable, and the deterministic
fake extractor (``fake_features=True``) hashes bytes into a fixed-width
feature vector so the Spark-side plumbing — schema, batching, partition
flow — is real and tested end-to-end.

Scale notes: media rows are large — ``load_media`` repartitions the scan
to a byte budget computed from the file listing, and the UDF streams
record batches (mapInPandas) so no executor ever materializes a
partition of raw media at once. Feature extraction is embarrassingly
parallel: no shuffle at all until the (small) feature output is
aggregated.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_DIM = 16


def synth_media_table(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from
    sha256(media_id, seed) — a stand-in for real blobs with realistic
    schema, fully JVM/Arrow-side."""
    df = spark.range(0, n, 1, 4).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(f"#{seed}")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1920)) + 16).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1080)) + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(300)) + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
    return df


def load_media(
    spark: SparkSession, path: str, target_mb_per_partition: int | float = 64
) -> DataFrame:
    """Read a media parquet table partitioned to a BYTE budget: partition
    count = ceil(total file bytes / budget), with total bytes taken from
    the filesystem listing (Hadoop ``getContentSummary`` — works the same
    on HDFS/S3A/local, no data read). Media blobs make row-count-based
    partitioning meaningless: 10k rows can be 1 MB of thumbnails or 400 GB
    of video, and a decode UDF needs partitions sized to executor memory,
    not to row counts.

    When the parquet scan already yields at least that many splits (the
    scan itself splits files at ``spark.sql.files.maxPartitionBytes``),
    the result is a narrow ``coalesce`` — no shuffle. Only when the budget
    is SMALLER than the scan's split size (few huge row groups, small
    executors) does it pay one shuffle to spread the blobs."""
    if target_mb_per_partition <= 0:
        raise ValueError("target_mb_per_partition must be positive")
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_parts = max(1, math.ceil(total_bytes / (target_mb_per_partition * 1024**2)))
    df = spark.read.parquet(path)
    scan_parts = df.rdd.getNumPartitions()
    if scan_parts >= n_parts:
        return df.coalesce(n_parts)
    return df.repartition(n_parts)


def decode_image(payload: bytes):
    """Real decode path — gated on Pillow being present (it is not in
    this container; the stub keeps the call signature honest)."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "environment; use fake_features=True for plumbing tests"
        ) from e


def _fake_feature_vector(payload: bytes) -> list[float]:
    """Deterministic bytes → FEATURE_DIM floats in [0,1) via sha256
    expansion (stands in for a CNN/audio embedding)."""
    out: list[float] = []
    counter = 0
    while len(out) < FEATURE_DIM:
        h = hashlib.sha256(payload + counter.to_bytes(2, "big")).digest()
        for i in range(0, 32, 4):
            if len(out) >= FEATURE_DIM:
                break
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
        counter += 1
    return out


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    fake_features: bool = True,
    batch_limit: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction: media rows in → (media_id, kind,
    features array<double>, n_bytes) out. The UDF is a generator over
    record batches — bounded memory regardless of partition size."""
    if not fake_features:
        raise NotImplementedError(
            "real decoders (Pillow/librosa/av) are not available in this "
            "container; the Spark plumbing below is identical for real ones"
        )
    import pandas as pd

    out_schema = "media_id long, kind string, n_bytes int, features array<double>"

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": chunk[payload_col].map(len).astype("int32"),
                        "features": chunk[payload_col].map(_fake_feature_vector),
                    }
                )

    return df.mapInPandas(extract, out_schema)


def sample_frames(
    df: DataFrame, every_nth: int = 10
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (explode of a JVM-side sequence — the real decoder would
    read just those frames). No Python in this stage at all."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_nth)
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"), "meta")
    )
