"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shape, partitioning, UDF
signatures) is real and tested; only the *external-library* decode steps
are stubbed (no PIL/ffmpeg in this container) behind clearly marked
seams. Our own ``png``/``qdct`` codecs ARE implemented (codecs.py), so
image decode/resize/feature paths run for real on engine-produced data.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.functions.codecs import decode, encode, phash64

DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode → per-image pixel stats, Arrow-batched via mapInPandas.
    Input needs (image_id, bytes, fmt). Bounded batches (see session.py
    maxRecordsPerBatch) keep executor memory flat at 100 TB."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": px.shape[1],
                        "h": px.shape[0],
                        "mean_px": float(px.mean()),
                        "std_px": float(px.std()),
                        "phash": phash64(px),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_STATS_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=DECODE_STATS_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Nearest-neighbor resize, re-encoded with the source codec."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                ys = (np.arange(out_h) * px.shape[0] // out_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(out_w) * px.shape[1] // out_w).clip(0, px.shape[1] - 1)
                small = px[np.ix_(ys, xs)]
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": encode(small, r.fmt),
                        "w": out_w,
                        "h": out_h,
                        "fmt": r.fmt,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(go, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------- stubs


def decode_external(images: DataFrame, fmt: str) -> DataFrame:
    """STUB: jpeg/webp/audio/video decode requires PIL/ffmpeg — absent in
    this container. The Spark plumbing (schema, batching, partitioning)
    is identical to decode_stats; swap the codec call on a real cluster."""
    raise NotImplementedError(
        f"external codec {fmt!r} not available in this environment; "
        "use fmt in {'png','qdct'} (crawler_spark.functions.codecs)"
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one row in → many frame rows out
    (UDTF shape). Deterministic fake frames (the container has no video
    codec); the schema/batching/explode shape is the real design."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                n_frames = max(1, len(bytes(r.bytes)) // 1024)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "frame_bytes": bytes(r.bytes)[i : i + 64],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return videos.select("media_id", "bytes").mapInPandas(go, schema=FRAME_SAMPLE_SCHEMA)


def embed_images(images: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic toy image embedding (block-mean grid, L2-normalized)
    — the feature-extraction seam a real model UDF would fill."""

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    side = int(dim**0.5)

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt).astype(np.float32)
                h, w = px.shape
                bh, bw = max(h // side, 1), max(w // side, 1)
                grid = px[: bh * side, : bw * side].reshape(side, bh, side, bw).mean(
                    axis=(1, 3)
                ).flatten()
                nrm = float(np.linalg.norm(grid)) or 1.0
                rows.append({"image_id": r.image_id, "embedding": (grid / nrm).tolist()})
            yield pd.DataFrame(rows, columns=["image_id", "embedding"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(go, schema=schema)


LUMA_HIST_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("hist", T.ArrayType(T.DoubleType())),
        T.StructField("dominant_bin", T.IntegerType()),
    ]
)


def luma_hist(images: DataFrame, n_bins: int = 16) -> DataFrame:
    """Decode → L1-normalized intensity histogram per image, plus the
    dominant bin as a cheap blocking key. Arrow-batched mapInPandas
    like decode_stats; the histogram is ``n_bins`` doubles regardless
    of image size, so the downstream pair join moves O(n_bins) per row
    no matter how large the source images are — decode once, compare
    tiny signatures forever. 256 must divide into ``n_bins`` even
    buckets (uint8 pixels)."""
    if 256 % n_bins:
        raise ValueError("n_bins must divide 256")
    shift = 256 // n_bins

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                counts = np.bincount(
                    (px.ravel() // shift).astype(np.int64), minlength=n_bins
                ).astype(np.float64)
                hist = counts / counts.sum()
                rows.append(
                    {
                        "image_id": r.image_id,
                        "hist": hist.tolist(),
                        "dominant_bin": int(hist.argmax()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in LUMA_HIST_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=LUMA_HIST_SCHEMA
    )


def hist_intersection_pairs(
    hists: DataFrame, min_intersection: float = 0.9
) -> DataFrame:
    """Histogram-intersection near-dup candidates: block on the
    dominant bin (two images whose intersection is >= 0.9 MUST share
    their heaviest bin when that bin holds > 55% mass — and in any
    case blocking trades recall for never materializing O(n²)), then
    score sum(min(a_i, b_i)) with native zip_with/aggregate — JVM-side,
    whole-stage codegen, no Python in the pair loop. Returns
    (image_a, image_b, intersection) for pairs >= min_intersection."""
    a = hists.select(
        F.col("dominant_bin"),
        F.col("image_id").alias("image_a"),
        F.col("hist").alias("ha"),
    )
    b = hists.select(
        F.col("dominant_bin"),
        F.col("image_id").alias("image_b"),
        F.col("hist").alias("hb"),
    )
    inter = F.aggregate(
        F.zip_with("ha", "hb", lambda x, y: F.least(x, y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "dominant_bin")
        .filter(F.col("image_a") < F.col("image_b"))
        .select(
            "image_a",
            "image_b",
            F.round(inter, 6).alias("intersection"),
        )
        .filter(F.col("intersection") >= min_intersection)
    )


PAIR_PSNR_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.StringType()),
        T.StructField("doc_b", T.StringType()),
        T.StructField("hamming", T.LongType()),
        T.StructField("psnr_db", T.DoubleType()),
    ]
)


def verify_pairs_psnr(
    pairs: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    min_psnr: float = 30.0,
) -> DataFrame:
    """Exact verify stage after phash banding: decode both candidates
    and keep pairs whose pixel PSNR clears ``min_psnr`` — the north
    rule's decoded-pixel invariant as an operator. Candidate pairs are
    ~true near-dups (banded LSH), so the expensive decode touches a
    vanishing fraction of the corpus; the two image joins are plain
    hash joins on the pair ids. Shape-mismatched pairs score 0 dB
    (never near-dups); identical pixels cap at 99 dB (finite schema).

    ``pairs``: (doc_a, doc_b, hamming) as produced by
    ``dedup.hamming64_pairs``; ``images``: (image_id, bytes, fmt).
    """
    a = images.select(
        F.col(id_col).alias("doc_a"),
        F.col("bytes").alias("bytes_a"),
        F.col("fmt").alias("fmt_a"),
    )
    b = images.select(
        F.col(id_col).alias("doc_b"),
        F.col("bytes").alias("bytes_b"),
        F.col("fmt").alias("fmt_b"),
    )
    joined = pairs.join(a, "doc_a").join(b, "doc_b").select(
        "doc_a", "doc_b", "hamming", "bytes_a", "fmt_a", "bytes_b", "fmt_b"
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crawler_spark.functions.codecs import psnr

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pa = decode(bytes(r.bytes_a), r.fmt_a)
                pb = decode(bytes(r.bytes_b), r.fmt_b)
                if pa.shape != pb.shape:
                    db = 0.0
                else:
                    db = min(float(psnr(pa, pb)), 99.0)
                rows.append(
                    {
                        "doc_a": r.doc_a,
                        "doc_b": r.doc_b,
                        "hamming": int(r.hamming),
                        "psnr_db": round(db, 3),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAIR_PSNR_SCHEMA.fields]
            )

    return joined.mapInPandas(go, schema=PAIR_PSNR_SCHEMA).filter(
        F.col("psnr_db") >= min_psnr
    )


SHARPNESS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("sharpness", T.DoubleType()),
        T.StructField("is_blurry", T.BooleanType()),
    ]
)


def sharpness_scores(images: DataFrame, blur_below: float = 30.0) -> DataFrame:
    """Laplacian-variance blur detection — the standard curation gate
    for image training data (variance of the 4-neighbor Laplacian
    response; blurred images have weak high-frequency content, so the
    variance collapses). Input (image_id, bytes, fmt); Arrow-batched
    mapInPandas like decode_stats, the Laplacian is three vectorized
    numpy ops per image — no pixel loops. ``is_blurry`` applies the
    threshold so the curation pass downstream is a plain filter."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt).astype(np.float64)
                lap = (
                    -4.0 * px[1:-1, 1:-1]
                    + px[:-2, 1:-1]
                    + px[2:, 1:-1]
                    + px[1:-1, :-2]
                    + px[1:-1, 2:]
                )
                v = float(lap.var()) if lap.size else 0.0
                rows.append(
                    {
                        "image_id": r.image_id,
                        "sharpness": v,
                        "is_blurry": v < blur_below,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SHARPNESS_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=SHARPNESS_SCHEMA
    )


EXPOSURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("clip_low_frac", T.DoubleType()),
        T.StructField("clip_high_frac", T.DoubleType()),
        T.StructField("entropy_bits", T.DoubleType()),
        T.StructField("dynamic_range", T.IntegerType()),
        T.StructField("well_exposed", T.BooleanType()),
        T.StructField("has_detail", T.BooleanType()),
    ]
)


def exposure_entropy_gates(
    images: DataFrame,
    luma_lo: float = 32.0,
    luma_hi: float = 224.0,
    clip_max_frac: float = 0.25,
    min_entropy_bits: float = 3.0,
) -> DataFrame:
    """Exposure + information-content curation gates — the cheap
    pixel-statistics pass a LAION-style image pipeline runs on every
    decoded image before any model-based scoring: near-black / blown-out
    frames, single-color placeholders, and test patterns carry no
    training signal and are droppable from the histogram alone.

    Per image: mean luma, clipped-shadow/highlight fractions (<=2 /
    >=253), Shannon entropy of the 256-bin luma histogram (bits),
    dynamic range (p95 - p5 of luma), and two gate flags —
    ``well_exposed`` (mean inside [luma_lo, luma_hi] and neither clip
    fraction above ``clip_max_frac``) and ``has_detail``
    (entropy >= ``min_entropy_bits``).

    Same scale shape as decode_stats: Arrow-batched mapInPandas,
    bounded batches (session.py maxRecordsPerBatch), one np.bincount +
    vectorized reductions per image, no pixel loops, and only the
    (image_id, bytes, fmt) columns ever enter the Python worker."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                flat = px.reshape(-1)
                n = flat.size
                hist = np.bincount(flat, minlength=256).astype(np.float64)
                p = hist[hist > 0] / n
                entropy = float(-(p * np.log2(p)).sum())
                lo = float((flat <= 2).sum() / n)
                hi = float((flat >= 253).sum() / n)
                mean = float(flat.mean())
                p5, p95 = np.percentile(flat, [5.0, 95.0])
                rows.append(
                    {
                        "image_id": r.image_id,
                        "mean_luma": mean,
                        "clip_low_frac": lo,
                        "clip_high_frac": hi,
                        "entropy_bits": entropy,
                        "dynamic_range": int(p95 - p5),
                        "well_exposed": (
                            luma_lo <= mean <= luma_hi
                            and lo <= clip_max_frac
                            and hi <= clip_max_frac
                        ),
                        "has_detail": entropy >= min_entropy_bits,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in EXPOSURE_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=EXPOSURE_SCHEMA
    )


TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("src_fmt", T.StringType()),
        T.StructField("dst_fmt", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("src_bytes", T.IntegerType()),
        T.StructField("dst_bytes", T.IntegerType()),
        T.StructField("psnr_db", T.DoubleType()),
    ]
)


def transcode_images(images: DataFrame, dst_fmt: str) -> DataFrame:
    """Format transcoding with a built-in quality audit: decode each
    image from its source codec, re-encode in ``dst_fmt``, and report
    the PSNR between the source pixels and the transcoded-then-decoded
    pixels — the storage-normalization pass a crawl archive runs (one
    on-disk format), with the north rule's decoded-pixel invariant
    (PSNR >= 40 dB for lossy) measured per row instead of assumed.
    Identical pixels cap at 99 dB (finite schema). Arrow-batched
    mapInPandas; same scale contract as decode_stats."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crawler_spark.functions.codecs import psnr

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                out = encode(px, dst_fmt)
                back = decode(out, dst_fmt)
                db = min(float(psnr(px, back)), 99.0)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "src_fmt": r.fmt,
                        "dst_fmt": dst_fmt,
                        "bytes": out,
                        "src_bytes": len(bytes(r.bytes)),
                        "dst_bytes": len(out),
                        "psnr_db": round(db, 3),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TRANSCODE_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=TRANSCODE_SCHEMA
    )


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("patch_row", T.IntegerType()),
        T.StructField("patch_col", T.IntegerType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


def image_patches(images: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch extraction: each image explodes into its grid of
    ``patch`` x ``patch`` tiles (one row per patch with grid position +
    pixel offset), each re-encoded in the source codec — the offline
    patchification pass a vision-training pipeline materializes so the
    loader never decodes full images. Images are cropped to the largest
    patch multiple (standard ViT behavior); a mean-luma column rides
    along so downstream can drop empty tiles without re-decoding.

    One row in -> (h//p)*(w//p) rows out (flatMap in mapInPandas, the
    UDTF shape); slicing is a numpy view per patch, the only copies are
    the encodes. Output volume is ~input volume — at 100 TB the output
    partitioning should follow image_id (already the input layout), so
    the explode never shuffles."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                nr, nc = px.shape[0] // patch, px.shape[1] // patch
                for i in range(nr):
                    for j in range(nc):
                        tile = np.ascontiguousarray(
                            px[i * patch : (i + 1) * patch, j * patch : (j + 1) * patch]
                        )
                        rows.append(
                            {
                                "image_id": r.image_id,
                                "patch_row": i,
                                "patch_col": j,
                                "py": i * patch,
                                "px": j * patch,
                                "bytes": encode(tile, r.fmt),
                                "fmt": r.fmt,
                                "mean_px": round(float(tile.mean()), 6),
                            }
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in PATCH_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=PATCH_SCHEMA
    )


WATERMARK_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("region_edge", T.DoubleType()),
        T.StructField("global_edge", T.DoubleType()),
        T.StructField("overlay_score", T.DoubleType()),
        T.StructField("has_overlay", T.BooleanType()),
    ]
)


def watermark_scores(
    images: DataFrame,
    region_frac: float = 0.25,
    score_thresh: float = 3.0,
    min_region_edge: float = 16.0,
) -> DataFrame:
    """Watermark / overlay-text heuristic — the deterministic stand-in
    for LAION's watermark model (no model ships in this container; the
    Spark shape is the real one). Overlay logos and stamped text are
    high-contrast content concentrated in a canonical region (a corner
    or the bottom strip), so per image we compare the mean |Laplacian|
    edge density of the five canonical overlay regions against the
    whole-image density: ``overlay_score = max_region / global``. A
    clean photo is spatially stationary (score ≈ 1); a stamped corner
    dominates its region (score >> 1). ``min_region_edge`` stops
    near-flat images from tripping the ratio on noise.

    Arrow-batched mapInPandas, three vectorized numpy ops per image —
    same scale contract as decode_stats (bounded batches, only
    (image_id, bytes, fmt) enter Python)."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt).astype(np.float64)
                lap = np.abs(
                    -4.0 * px[1:-1, 1:-1]
                    + px[:-2, 1:-1]
                    + px[2:, 1:-1]
                    + px[1:-1, :-2]
                    + px[1:-1, 2:]
                )
                if lap.size == 0:
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "region": "none",
                            "region_edge": 0.0,
                            "global_edge": 0.0,
                            "overlay_score": 0.0,
                            "has_overlay": False,
                        }
                    )
                    continue
                h, w = lap.shape
                rh = max(int(h * region_frac), 1)
                rw = max(int(w * region_frac), 1)
                bs = max(int(h * 0.15), 1)
                regions = (
                    ("top_left", lap[:rh, :rw]),
                    ("top_right", lap[:rh, -rw:]),
                    ("bottom_left", lap[-rh:, :rw]),
                    ("bottom_right", lap[-rh:, -rw:]),
                    ("bottom_strip", lap[-bs:, :]),
                )
                g = float(lap.mean())
                name, rd = max(
                    ((k, float(v.mean())) for k, v in regions),
                    key=lambda kv: kv[1],
                )
                score = rd / (g + 1e-9)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "region": name,
                        "region_edge": round(rd, 6),
                        "global_edge": round(g, 6),
                        "overlay_score": round(score, 6),
                        "has_overlay": bool(
                            score >= score_thresh and rd >= min_region_edge
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WATERMARK_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=WATERMARK_SCHEMA
    )


AUGMENT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("variant", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def augment_images(images: DataFrame) -> DataFrame:
    """Deterministic training-time augmentation plumbing: per input
    image emit the identity, a horizontal flip, and a center crop
    (middle 3/4 in each dimension), each RE-ENCODED in the source
    format — the offline-augmentation pass an image-training pipeline
    materializes next to the original so the loader streams variants
    without decode-time transforms.

    One input row -> 3 output rows (a flatMap in mapInPandas: Arrow
    batches in, concatenated variant batches out); transforms are pure
    numpy views (fliplr, slicing), no interpolation, so the png path is
    pixel-exact round-trippable and the qdct path stays within its
    codec's PSNR envelope — both pinned by tests."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                ch, cw = (px.shape[0] // 8) * 1, (px.shape[1] // 8) * 1
                crop = px[ch : px.shape[0] - ch, cw : px.shape[1] - cw]
                for variant, arr in (
                    ("orig", px),
                    ("hflip", np.fliplr(px)),
                    ("crop75", crop),
                ):
                    arr = np.ascontiguousarray(arr)
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "variant": variant,
                            "w": arr.shape[1],
                            "h": arr.shape[0],
                            "bytes": encode(arr, r.fmt),
                            "fmt": r.fmt,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUGMENT_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=AUGMENT_SCHEMA
    )


ALT_HASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def alt_hashes(images: DataFrame) -> DataFrame:
    """Perceptual-hash ensemble: pHash (block-mean/median), dHash
    (horizontal gradient), aHash (block-mean/mean) per image in ONE
    decode pass — the dedup-ensemble input (a pair is a near-dup when
    >= 2 of 3 hashes agree within their Hamming band, which kills each
    family's characteristic false positives: aHash on skewed
    histograms, dHash on smooth gradients, pHash on crops).

    One Arrow-batched mapInPandas stage over (image_id, bytes, fmt);
    downstream agreement math (bit_count(xor)) is native and
    codegen-able — see the image_hash_agreement query."""

    from crawler_spark.functions.codecs import ahash64, dhash64

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "phash": phash64(px),
                        "dhash": dhash64(px),
                        "ahash": ahash64(px),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in ALT_HASH_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=ALT_HASH_SCHEMA
    )


FLIP_SIG_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("flip_phash", T.LongType()),
    ]
)


def flip_canonical_sigs(images: DataFrame) -> DataFrame:
    """Plain pHash + orientation-canonical pHash (codecs.py
    flip_min_phash64) per image in one decode pass. Downstream banded
    Hamming over ``flip_phash`` recalls mirrored/rotated-180 twins that
    the plain hash scatters to Hamming ~32 (random distance); shipping
    both columns lets the dedup report attribute each catch to
    orientation or to genuine pixel similarity."""

    from crawler_spark.functions.codecs import flip_min_phash64

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "phash": phash64(px),
                        "flip_phash": flip_min_phash64(px),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FLIP_SIG_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=FLIP_SIG_SCHEMA
    )


D4_SIG_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("flip_phash", T.LongType()),
        T.StructField("d4_phash", T.LongType()),
    ]
)


def dihedral_canonical_sigs(images: DataFrame) -> DataFrame:
    """Plain + flip-canonical + full-D4-canonical pHash per image in a
    single decode pass (codecs.dihedral_min_phash64). The d4 column
    additionally folds the aspect-transposing 90°/270° rotations into
    one signature, so a banded-Hamming pass keyed on it recalls
    portrait/landscape re-uploads the flip canonical scatters; carrying
    all three columns lets the dedup report attribute each catch to
    orientation class. Same Arrow-batched mapInPandas shape as
    flip_canonical_sigs — one decode, three hashes, no shuffle."""

    from crawler_spark.functions.codecs import (
        dihedral_min_phash64,
        flip_min_phash64,
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "phash": phash64(px),
                        "flip_phash": flip_min_phash64(px),
                        "d4_phash": dihedral_min_phash64(px),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in D4_SIG_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=D4_SIG_SCHEMA
    )


BORDER_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("top", T.IntegerType()),
        T.StructField("bottom", T.IntegerType()),
        T.StructField("left", T.IntegerType()),
        T.StructField("right", T.IntegerType()),
        T.StructField("border_frac", T.DoubleType()),
        T.StructField("letterboxed", T.BooleanType()),
    ]
)


def border_scores(
    images: DataFrame, tol: float = 2.0, min_frac: float = 0.08
) -> DataFrame:
    """Letterbox / uniform-border detection (the LAION-style curation
    gate that precedes any crop: black bars and solid frames inflate
    resolution metadata and poison aspect-ratio bucketing). A border
    row/column is one whose pixel range (max - min) is <= ``tol``;
    each side's border width is the run of such lines from that edge,
    capped at half the dimension so a fully-flat image reads as
    all-border without double counting. ``letterboxed`` fires when
    either axis loses >= ``min_frac`` of its extent to borders.

    Vectorized per image (two ptp reductions + argmin scans, no Python
    loops over pixels), one Arrow-batched mapInPandas stage."""

    def _run(flags: np.ndarray) -> int:
        # leading True run length; argmin finds the first False
        if flags.all():
            return len(flags)
        return int(np.argmin(flags))

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt).astype(np.int32)
                h, w = px.shape
                row_ptp = px.max(axis=1) - px.min(axis=1)
                col_ptp = px.max(axis=0) - px.min(axis=0)
                rflat = row_ptp <= tol
                cflat = col_ptp <= tol
                top = min(_run(rflat), h // 2)
                bottom = min(_run(rflat[::-1]), h // 2)
                left = min(_run(cflat), w // 2)
                right = min(_run(cflat[::-1]), w // 2)
                frac = ((top + bottom) * w + (left + right) * h) / float(h * w + 1)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": w,
                        "h": h,
                        "top": top,
                        "bottom": bottom,
                        "left": left,
                        "right": right,
                        "border_frac": frac,
                        "letterboxed": bool(
                            (top + bottom) >= min_frac * h
                            or (left + right) >= min_frac * w
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in BORDER_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=BORDER_SCHEMA
    )


TILE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("gx", T.IntegerType()),
        T.StructField("gy", T.IntegerType()),
        T.StructField("tile_phash", T.LongType()),
    ]
)


def tile_hashes(images: DataFrame, tile: int = 16) -> DataFrame:
    """Tile-level perceptual-hash index for SUB-image matching: pHash of
    every aligned ``tile``x``tile`` block — the crop/thumbnail detector
    whole-image hashing is structurally blind to (a quadrant crop
    shares zero whole-image pHash bits but is bit-identical at the tile
    level). Joining a suspect image's whole pHash against this index on
    equality finds "is this a crop of something we already have" in one
    shuffle on a uniform 64-bit key — the image-side analog of the
    substring_overlap window index (contiguous-region evidence, where
    phash-banding is the set-similarity analog).

    One Arrow-batched mapInPandas flatMap (UDTF shape, same as
    image_patches); grid edges that don't fill a full tile are dropped
    (partial tiles hash unstably under recompression). Index size is
    (w//tile)*(h//tile) rows per image — bounded, explode-free."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                h, w = px.shape
                for gy in range(h // tile):
                    for gx in range(w // tile):
                        t = px[
                            gy * tile : (gy + 1) * tile,
                            gx * tile : (gx + 1) * tile,
                        ]
                        rows.append(
                            {
                                "image_id": r.image_id,
                                "gx": gx,
                                "gy": gy,
                                "tile_phash": phash64(t),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TILE_HASH_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=TILE_HASH_SCHEMA
    )


DCT_HASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("dct_phash", T.LongType()),
    ]
)


def dct_hashes(images: DataFrame) -> DataFrame:
    """Spatial block-mean hash + frequency-domain DCT pHash per image in
    ONE decode pass. The DCT hash (codecs.dct_phash64) is exactly
    invariant to affine brightness/contrast edits pre-quantization, and
    under uint8 re-quantization it flips a DIFFERENT bit population
    than the block-mean hash (near-zero AC coefficients vs
    median-adjacent block means) — the decorrelated second opinion a
    >=2-of-k near-dup ensemble needs.

    One Arrow-batched mapInPandas stage over (image_id, bytes, fmt);
    both signatures are int64 so the downstream banded Hamming join and
    bit_count(xor) agreement math stay native/codegen-able."""

    from crawler_spark.functions.codecs import dct_phash64

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "phash": phash64(px),
                        "dct_phash": dct_phash64(px),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DCT_HASH_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=DCT_HASH_SCHEMA
    )


def decode_stats_arrow(images: DataFrame) -> DataFrame:
    """`mapInArrow` twin of decode_stats: identical output, but the
    binary column stays an Arrow buffer end-to-end — no pandas
    object-dtype materialization of the payload bytes (for a binary-
    heavy column that conversion is a per-row PyObject allocation +
    memcpy; Arrow hands back zero-copy buffer slices). The python
    decode itself still dominates per-image cost; this variant exists
    because at 100 TB the conversion tax is pure overhead on every
    image that flows through ANY python stage, and because parity is
    cheap to prove (tests/test_multimodal_arrow.py: bit-identical
    output on both paths)."""
    import pyarrow as pa

    def go(batches):
        for rb in batches:
            ids = rb.column(0).to_pylist()
            fmts = rb.column(2).to_pylist()
            col = rb.column(1)
            w, h, mean, std, ph = [], [], [], [], []
            for i in range(rb.num_rows):
                px = decode(col[i].as_py(), fmts[i])
                w.append(px.shape[1])
                h.append(px.shape[0])
                mean.append(float(px.mean()))
                std.append(float(px.std()))
                ph.append(phash64(px))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(w, pa.int32()),
                    pa.array(h, pa.int32()),
                    pa.array(mean, pa.float64()),
                    pa.array(std, pa.float64()),
                    pa.array(ph, pa.int64()),
                ],
                names=[f.name for f in DECODE_STATS_SCHEMA.fields],
            )

    return images.select("image_id", "bytes", "fmt").mapInArrow(
        go, schema=DECODE_STATS_SCHEMA
    )


def native_image_dims(images: DataFrame) -> DataFrame:
    """Header-only dimension extraction in PURE native expressions — no
    decode, no Python, whole-stage codegen: PNG IHDR carries width/
    height as big-endian uint32 at bytes 17-24; the qdct header as
    uint16 at bytes 1-4. substring on the binary column + hex + conv is
    all JVM-side, so at 10^10 images the dimension scan reads headers
    at parquet-scan speed while `decode_stats` pays a python decode per
    image — use this for resolution bucketing / AR filters and decode
    only what survives. Parity with the decode path is pinned by
    test_multimodal_arrow."""
    is_png = F.col("fmt") == "png"
    w = F.when(
        is_png,
        F.expr("cast(conv(hex(substring(bytes, 17, 4)), 16, 10) as bigint)"),
    ).otherwise(
        F.expr("cast(conv(hex(substring(bytes, 1, 2)), 16, 10) as bigint)")
    )
    h = F.when(
        is_png,
        F.expr("cast(conv(hex(substring(bytes, 21, 4)), 16, 10) as bigint)"),
    ).otherwise(
        F.expr("cast(conv(hex(substring(bytes, 3, 2)), 16, 10) as bigint)")
    )
    return images.select("image_id", w.alias("w"), h.alias("h"))


PAIR_SSIM_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.StringType()),
        T.StructField("doc_b", T.StringType()),
        T.StructField("hamming", T.LongType()),
        T.StructField("ssim", T.DoubleType()),
    ]
)


def verify_pairs_ssim(
    pairs: DataFrame,
    images: DataFrame,
    id_col: str = "image_id",
    min_ssim: float = 0.7,
) -> DataFrame:
    """SSIM verify stage after phash banding (codecs.ssim; Wang et al.
    IEEE TIP 2004) — the perceptual companion to verify_pairs_psnr:
    PSNR charges every pixel error equally, so a global brightness
    shift (a harmless re-encode) can flunk a true duplicate while
    localized structural damage passes; SSIM compares local luminance/
    contrast/structure and gets both cases right. Same scale shape as
    the PSNR verify: candidates are ~true near-dups so the decode
    touches a vanishing fraction of the corpus, two plain hash joins,
    Arrow-batched map. Shape-mismatched pairs score -1 (never dups).
    """
    a = images.select(
        F.col(id_col).alias("doc_a"),
        F.col("bytes").alias("bytes_a"),
        F.col("fmt").alias("fmt_a"),
    )
    b = images.select(
        F.col(id_col).alias("doc_b"),
        F.col("bytes").alias("bytes_b"),
        F.col("fmt").alias("fmt_b"),
    )
    joined = pairs.join(a, "doc_a").join(b, "doc_b").select(
        "doc_a", "doc_b", "hamming", "bytes_a", "fmt_a", "bytes_b", "fmt_b"
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crawler_spark.functions.codecs import ssim

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pa = decode(bytes(r.bytes_a), r.fmt_a)
                pb = decode(bytes(r.bytes_b), r.fmt_b)
                if pa.shape != pb.shape:
                    s = -1.0
                else:
                    s = float(ssim(pa, pb))
                rows.append(
                    {
                        "doc_a": r.doc_a,
                        "doc_b": r.doc_b,
                        "hamming": int(r.hamming),
                        "ssim": round(s, 4),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAIR_SSIM_SCHEMA.fields]
            )

    return joined.mapInPandas(go, schema=PAIR_SSIM_SCHEMA).filter(
        F.col("ssim") >= min_ssim
    )


ELA_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("ela_mean", T.DoubleType()),
        T.StructField("ela_max", T.DoubleType()),
        T.StructField("quad_ratio", T.DoubleType()),
        T.StructField("splice_suspect", T.BooleanType()),
    ]
)


def ela_scores(
    images: DataFrame,
    quality_fmt: str = "qdct",
    ratio_above: float = 2.0,
) -> DataFrame:
    """Error-level analysis (classic image forensics; Krawetz's ELA):
    re-compress each image once with the lossy codec and measure where
    the pixels change. A homogeneous image loses roughly uniformly; a
    SPLICED image — a patch pasted in with a different compression
    history — re-loses unevenly, so the per-quadrant error landscape is
    lumpy. The crawl read: composited/manipulated images in a training
    corpus light up here with no model and no metadata.

    Per image (Arrow-batched mapInPandas, vectorized numpy): decode ->
    re-encode with the in-repo lossy ``qdct`` codec -> decode -> the
    absolute pixel error's mean and max, plus quad_ratio = max
    quadrant mean error / min quadrant mean error (the lumpiness
    statistic; uniform images sit near 1). ``splice_suspect`` flags
    quad_ratio >= ratio_above. Deterministic — our codec, no external
    libs.
    """

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.bytes), r.fmt).astype(np.float64)
                re_px = decode(
                    encode(px.astype(np.uint8), quality_fmt), quality_fmt
                ).astype(np.float64)
                err = np.abs(px - re_px)
                h, w = err.shape
                hh, hw = max(h // 2, 1), max(w // 2, 1)
                quads = [
                    float(err[:hh, :hw].mean()),
                    float(err[:hh, hw:].mean()) if hw < w else 0.0,
                    float(err[hh:, :hw].mean()) if hh < h else 0.0,
                    float(err[hh:, hw:].mean()) if hh < h and hw < w else 0.0,
                ]
                mean_err = float(err.mean())
                ratio = max(quads) / (mean_err + 1e-6)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "ela_mean": round(mean_err, 4),
                        "ela_max": round(float(err.max()), 4),
                        "quad_ratio": round(ratio, 4),
                        "splice_suspect": bool(ratio >= ratio_above),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ELA_SCHEMA.fields]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        go, schema=ELA_SCHEMA
    )
