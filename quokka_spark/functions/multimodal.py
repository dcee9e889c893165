"""Multimodal (image/audio/video) column plumbing.

Extension target (BASELINE.json north star). Media payloads are opaque
``binary`` columns with typed metadata structs; all real decode work
happens in Arrow-batched pandas UDFs over ``mapInPandas``. The decode
kernels themselves are STUBBED (image/audio libs are not in this
container): ``deterministic=True`` produces a seeded fake so the
Spark-side plumbing — schema, batching, partitioning — is fully
testable; ``deterministic=False`` raises NotImplementedError where a
real libjpeg/ffmpeg call would go.

At 100 TB: media rows are large and skewed → repartition by size
buckets before the UDF stage (``repartition_by_payload_size``), keep
``spark.sql.files.maxPartitionBytes`` low for binaryFile scans, and
never collect payloads driver-side.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

IMAGE_META_SCHEMA = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
])

AUDIO_META_SCHEMA = StructType([
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
])


def _fake_pixels(payload: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic fake decode: seed from payload digest."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def decode_image(df: DataFrame, payload_col: str = "object",
                 id_col: str = "filename", height: int = 32, width: int = 32,
                 deterministic_stub: bool = True) -> DataFrame:
    """binary payload → fixed-size float feature vector (flattened,
    resized 'decode'). Real implementation would call PIL/libjpeg here."""
    out_schema = StructType([
        df.schema[id_col],
        StructField("pixels", ArrayType(FloatType())),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ])

    def run(it):
        for pdf in it:
            if not deterministic_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv (not in container)")
            pixels = [
                _fake_pixels(b, height, width, 3).mean(axis=2).ravel()
                .astype(np.float32).tolist()
                for b in pdf[payload_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "pixels": pixels,
                "width": width, "height": height,
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def extract_image_features(df: DataFrame, payload_col: str = "object",
                           id_col: str = "filename", dim: int = 64,
                           deterministic_stub: bool = True) -> DataFrame:
    """binary payload → embedding array<float> (a real pipeline would
    run a vision encoder via a Pandas UDF with model cached per worker)."""
    out_schema = StructType([
        df.schema[id_col],
        StructField("embedding", ArrayType(FloatType())),
    ])

    def run(it):
        for pdf in it:
            if not deterministic_stub:
                raise NotImplementedError("vision encoder not in container")
            embs = []
            for b in pdf[payload_col]:
                # deterministic fake: md5 byte stream mapped to exact
                # small integers (2*byte - 255 ∈ [-255, 255], odd) —
                # exactly representable in float32/float64. Hashing the
                # UPPERCASE HEX of the payload (not the raw bytes) keeps
                # the features reproducible in engines whose md5 only
                # accepts strings (the mm_features driver gate mirrors
                # this as md5(hex(payload)) in SQL).
                seed = bytes(b).hex().upper()
                raw = b""
                i = 0
                while len(raw) < dim:
                    tag = seed if i == 0 else f"{seed}#{i}"
                    raw += hashlib.md5(tag.encode()).digest()
                    i += 1
                v = np.frombuffer(raw[:dim], np.uint8).astype(np.float64)
                embs.append((v * 2 - 255).astype(np.float32).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, payload_col: str = "object",
                  id_col: str = "filename", every_n: int = 30,
                  max_frames: int = 8, deterministic_stub: bool = True) -> DataFrame:
    """video binary → exploded (id, frame_idx, frame_bytes) rows.
    Real implementation: ffmpeg keyframe sampling per partition."""
    out_schema = StructType([
        df.schema[id_col],
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ])

    def run(it):
        for pdf in it:
            if not deterministic_stub:
                raise NotImplementedError("ffmpeg not in container")
            ids, idxs, frames = [], [], []
            for fid, b in zip(pdf[id_col], pdf[payload_col]):
                n = min(max_frames, max(1, len(b) // max(every_n, 1) % (max_frames + 1)))
                for i in range(n):
                    ids.append(fid)
                    idxs.append(i * every_n)
                    frames.append(hashlib.md5(b + i.to_bytes(4, "little")).digest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def payload_metadata(df: DataFrame, payload_col: str = "object") -> DataFrame:
    """Cheap JVM-side metadata: size + magic-byte sniffing (no UDF)."""
    magic = F.hex(F.substring(payload_col, 1, 4))
    fmt = (F.when(magic.startswith("FFD8"), "jpeg")
           .when(magic.startswith("8950"), "png")
           .when(magic.startswith("4749"), "gif")
           .when(magic.startswith("5249"), "riff")
           .otherwise("unknown"))
    return df.withColumns({
        "payload_size": F.length(payload_col),
        "payload_format": fmt,
        "payload_md5": F.md5(payload_col),
    })


def repartition_by_payload_size(df: DataFrame, payload_col: str = "object",
                                target_bytes: int = 128 << 20) -> DataFrame:
    """Bin-pack skewed media rows into ~``target_bytes`` partitions.

    LPT-style (longest-processing-time) packing, fully distributed:
      1. one slim agg: total payload bytes → n_bins = ceil(total/target);
      2. range-shuffle rows by payload size descending (Spark's range
         partitioner — scalable global ordering, no single-task sort);
      3. global size-rank = per-range-partition row_number + partition
         offset (offsets from one tiny per-partition count job);
      4. bin = rank % n_bins → each bin receives every n_bins-th largest
         row, so huge rows spread across bins instead of colliding;
      5. range-repartition on bin id (bijective — hash-repartitioning
         n_bins distinct ints into n_bins partitions would collide).

    Cost: two slim jobs (sum, per-partition counts) + two shuffles, row
    payload shuffled twice. Use at ingest boundaries, not per-query.
    """
    import math

    from pyspark.sql import Window

    sized = df.withColumn("__sz__", F.length(payload_col).cast("long"))
    total = sized.agg(F.sum("__sz__")).first()[0] or 0
    n_bins = max(1, math.ceil(total / target_bytes))
    n_range = max(n_bins, df.rdd.getNumPartitions())

    # materialize the range-partition id BEFORE any downstream exchange:
    # spark_partition_id() used directly in a window/groupBy key would be
    # re-evaluated after that operator's own shuffle (wrong pid).
    # localCheckpoint, not persist(): the pid snapshot must be stable
    # across the counts job and the output plan, but a persist() here
    # would pin the payload bytes in executor storage with no safe place
    # to unpersist (the returned DataFrame still depends on it);
    # checkpoint blocks are reclaimed by the ContextCleaner once the
    # returned plan is garbage-collected
    ranked = (sized.repartitionByRange(n_range, F.desc("__sz__"))
              .withColumn("__pid__", F.spark_partition_id())
              .localCheckpoint(eager=True))
    counts = {r["__pid__"]: r["n"] for r in
              ranked.groupBy("__pid__")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("__pid__"))
    w = Window.partitionBy("__pid__").orderBy(F.desc("__sz__"))
    rank = off_expr + F.row_number().over(w) - 1
    # Range key = bin + within-bin fraction in [b+.25, b+.75]. Two
    # hazards with range-partitioning the discrete bin id directly:
    # boundary sampling can merge two bins into one partition, and a
    # row at exactly key=b can fall on the wrong side of a cut AT b.
    # Keys confined to the interval interior leave empty gaps around
    # integer boundaries for ideal cuts; and the within-bin order is
    # FOLDED — biggest rows (low pos) at the cluster center, smallest
    # at both edges — so a cut that strays into a cluster by sampling
    # error displaces only the bin's smallest rows, bounding byte
    # imbalance by (error_rows x small_row_size), never a huge row.
    n_rows = max(acc, 1)
    per_bin = -(-n_rows // n_bins)  # ceil
    bin_col = rank % n_bins
    pos = F.floor((rank - bin_col) / n_bins)
    fold = (1 - 2 * (pos % 2)) * F.floor((pos + 1) / 2)
    key = bin_col + 0.5 + fold / F.lit(2.0 * per_bin)
    binned = ranked.withColumn("__key__", key)
    return (binned.repartitionByRange(n_bins, "__key__")
            .drop("__sz__", "__key__", "__pid__"))


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG/pHash transform)."""
    k = np.arange(n)
    c = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    c[0] *= 1.0 / np.sqrt(2)
    return c * np.sqrt(2.0 / n)


def phash64(gray: np.ndarray) -> int:
    """64-bit perceptual hash of a 32×32 grayscale image: 2-D DCT-II,
    keep the 8×8 low-frequency block, threshold against the block's
    median EXCLUDING the DC term (the standard pHash recipe — DC is
    overall brightness and would otherwise dominate the median).
    Returns a SIGNED 64-bit int (Spark ``long``); bit i set ⇔
    coefficient i above the median. Pure function — visually similar
    images (small noise, brightness shifts) land within a few bits."""
    if gray.shape != (32, 32):
        raise ValueError(f"phash64 expects 32x32 grayscale, got {gray.shape}")
    c = _dct_matrix(32)
    d = c @ gray.astype(np.float64) @ c.T
    block = d[:8, :8].ravel()
    med = np.median(block[1:])
    bits = block > med
    h = 0
    for i, bit in enumerate(bits):
        if bit:
            h |= 1 << i
    if h >= 1 << 63:                       # two's-complement → long
        h -= 1 << 64
    return h


def image_phash(df: DataFrame, payload_col: str = "object",
                id_col: str = "filename",
                deterministic_stub: bool = True) -> DataFrame:
    """binary payload → 64-bit perceptual hash. The decode is the
    usual stub (deterministic md5-seeded fake pixels — no codec libs
    in container); the DCT + median threshold is the REAL pHash math,
    unit-tested against its noise/brightness invariances. Arrow-batched
    mapInPandas; map-side only, zero exchanges."""
    out_schema = StructType([
        df.schema[id_col],
        StructField("phash", LongType()),
    ])

    def run(it):
        for pdf in it:
            if not deterministic_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv (not in container)")
            hashes = [
                phash64(_fake_pixels(b, 32, 32, 3).mean(axis=2))
                for b in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hashes})

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def phash_near_pairs(df: DataFrame, payload_col: str = "object",
                     id_col: str = "filename",
                     max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash hamming distance —
    the visual twin of simhash text dedup, sharing its pigeonhole
    bucket join (dedup.hamming_near_pairs: ≤ k bits apart ⇒ the pair
    agrees on one of k+1 signature chunks). Returns
    (id1, id2, hamming)."""
    from .dedup import hamming_near_pairs
    sigs = image_phash(df, payload_col, id_col)
    return hamming_near_pairs(sigs, id_col, "phash", max_hamming)
