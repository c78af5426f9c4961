"""Image+caption pair curation: the LAION-style training-set filter.

The north-rule input table is (image_id, bytes, w, h, fmt, caption,
phash); a 100 TB training-data pipeline's first pass over it is a
metadata-only selection — resolution floor, aspect-ratio band, caption
token floor, exact perceptual-hash dedup — that never touches `bytes`.
That pass is what these operators implement, as pure native expressions
(column-pruned scan: the binary column is never read), with exact
ANSI-SQL oracles.

For the oracle gate the pair *metadata* is derived deterministically
from the `documents` table via portable md5-digit arithmetic (same
trick as the IVF oracle's hash cells), so DuckDB can reproduce the
identical table without reading engine-produced binaries. The engine's
real pair table (with bytes) comes from sources/synth.py leaf pages;
`select_training_pairs` works unchanged on either because it only
touches the metadata columns.

Scale notes: selection is filter + one groupBy(phash) shuffle with
map-side combine; the dedup join is a semi-join on (phash, image_id),
broadcastable when the survivor set is small, plain hash join otherwise.
No window over an unpartitioned key, no UDFs, no bytes read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hexdig(expr: str, i: int) -> Column:
    """Value 0-15 of the i-th (1-based) hex digit of md5(expr) —
    portable to any ANSI oracle via instr over the hex alphabet."""
    return F.expr(
        f"instr('0123456789abcdef', substring(md5({expr}), {i}, 1)) - 1"
    )


def synth_pair_meta(docs: DataFrame) -> DataFrame:
    """Deterministic pair-metadata table from `documents`:
    (image_id, w, h, fmt, n_tokens, phash).

    w/h in [32, 2072] step 8 from md5(doc_id) digits; fmt qdct/png from
    digit 5; phash = first 15 md5(text) hex digits as int64 (60 bits) so
    exact caption duplicates collide — the synthetic analog of identical
    images hashing identically."""
    toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    return docs.select(
        F.col("doc_id").alias("image_id"),
        (F.lit(32) + 8 * (16 * _hexdig("cast(doc_id as string)", 1)
                          + _hexdig("cast(doc_id as string)", 2)))
        .cast("int").alias("w"),
        (F.lit(32) + 8 * (16 * _hexdig("cast(doc_id as string)", 3)
                          + _hexdig("cast(doc_id as string)", 4)))
        .cast("int").alias("h"),
        F.when(_hexdig("cast(doc_id as string)", 5) < 8, "qdct")
        .otherwise("png").alias("fmt"),
        F.size(F.filter(toks, lambda t: F.length(t) > 0))
        .cast("long").alias("n_tokens"),
        F.expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)")
        .alias("phash"),
    )


def select_training_pairs(
    meta: DataFrame,
    min_side: int = 64,
    max_aspect: int = 3,
    min_tokens: int = 5,
) -> DataFrame:
    """Training-set selection over pair metadata: resolution floor,
    aspect band, caption-token floor, then exact-phash dedup keeping the
    smallest image_id (first-wins, deterministic)."""
    ok = meta.filter(
        (F.col("w") >= min_side)
        & (F.col("h") >= min_side)
        & (F.greatest("w", "h") <= max_aspect * F.least("w", "h"))
        & (F.col("n_tokens") >= min_tokens)
    )
    keep = ok.groupBy("phash").agg(F.min("image_id").alias("image_id"))
    return ok.join(keep, ["phash", "image_id"], "left_semi").select(
        "image_id", "w", "h", "fmt", "n_tokens", "phash"
    )


def _pos_sql(key: str, j: int) -> str:
    """SQL expr for the j-th (1..3) perturbation bit position (0-59):
    two md5 hex digits of `key` combined mod 60 — portable arithmetic
    shared verbatim by the Spark plan and the ANSI oracle."""
    def d(i: int) -> str:
        return f"(instr('0123456789abcdef', substring(md5({key}), {i}, 1)) - 1)"

    return f"((16 * {d(2 * j - 1)} + {d(2 * j)}) % 60)"


def phash_with_twins(
    meta: DataFrame, n_twins: int = 2, id_offset: int = 1_000_000_000
) -> DataFrame:
    """Base perceptual hashes plus deterministic near-duplicate twins:
    twin t of image i has id = i + t*id_offset and sig = phash with 3
    md5-chosen bits (positions < 60) flipped — the synthetic analog of
    re-encoded / slightly-edited copies of the same crawled image.
    Every twin is within Hamming 3 of its base and within 6 of the
    base's other twins, i.e. inside a banded Hamming<=7 recall radius,
    so hamming64_pairs + dedup_clusters over this table must recover
    one 3-node cluster per distinct caption. Pure native expressions;
    an ANSI oracle reproduces the table bit-for-bit.

    Output: (image_id: long, sig: long).
    """
    parts = [
        meta.select(
            F.col("image_id").cast("long").alias("image_id"),
            F.col("phash").alias("sig"),
        )
    ]
    for t in range(1, n_twins + 1):
        key = f"concat(cast(image_id as string), '#{t}')"
        sig = "phash"
        for j in (1, 2, 3):
            sig = f"({sig} ^ shiftleft(cast(1 as bigint), {_pos_sql(key, j)}))"
        parts.append(
            meta.select(
                (F.col("image_id").cast("long") + t * id_offset).alias("image_id"),
                F.expr(sig).alias("sig"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def caption_projection(
    docs: DataFrame, dim: int = 32, id_alias: str = "image_id"
) -> DataFrame:
    """Deterministic ``dim``-dim caption embedding: one md5 over the
    caption text gives 32 hex digits; element i = digit_i/7.5 - 1 in
    [-1, 1]. The stand-in for a real text encoder in this environment
    (caption_alignment / hard_negative_captions use the same family) —
    portable to any ANSI oracle, one md5 per row, no UDF. Returns
    (``id_alias``, cv: array<double>)."""
    m = docs.select(F.col("doc_id").alias(id_alias), F.md5("text").alias("__m"))
    return m.select(
        id_alias,
        F.array(
            *[
                # 7.5D / 1.0D: bare literals are DECIMAL in Spark and
                # decimal division truncates at ~1e-6; the oracle
                # computes in doubles, so we must too
                F.expr(
                    f"(instr('0123456789abcdef', substring(__m, {i}, 1)) - 1)"
                    f" / 7.5D - 1.0D"
                )
                for i in range(1, dim + 1)
            ]
        ).alias("cv"),
    )


def caption_alignment(
    docs: DataFrame,
    embeddings: DataFrame,
    dim: int = 32,
    threshold: float = 0.05,
) -> DataFrame:
    """CLIP-score-shaped alignment filter: rowwise cosine between each
    pair's image embedding and its caption embedding, thresholded — the
    curation step that drops pairs whose caption does not describe the
    image. No CLIP model ships in this environment, so the caption
    embedding is a deterministic 32-dim projection (one md5 call gives
    exactly 32 hex digits; element i = digit_i/7.5 - 1 in [-1, 1]) and
    the image side is the stored embedding's first ``dim`` components —
    the Spark shape (broadcast-free equi-join on the id, zip_with dot
    product, native aggregate fold, no UDF) is exactly the real
    pipeline's.

    Output: (image_id, align_score, kept) for every pair. Scores are
    computed on doubles (float32 products lose ~1e-7 — cast BEFORE
    multiply) and rounded to 6 decimals; ``kept`` compares the rounded
    score so the oracle can't disagree at the last ulp.
    """
    m = docs.select(F.col("doc_id").alias("image_id"), F.md5("text").alias("__m"))
    # caption vector from the 32 md5 hex digits — the md5 is projected
    # ONCE (higher-order/array expressions are not CSE'd)
    cap = m.select(
        "image_id",
        F.array(
            *[
                # 7.5D / 1.0D: bare SQL literals are DECIMAL(2,1) in
                # Spark, and decimal division truncates at ~1e-6 —
                # the oracle computes in doubles, so we must too
                F.expr(
                    f"(instr('0123456789abcdef', substring(__m, {i}, 1)) - 1)"
                    f" / 7.5D - 1.0D"
                )
                for i in range(1, dim + 1)
            ]
        ).alias("a"),
    )
    img = embeddings.select(
        F.col("vec_id").alias("image_id"),
        F.slice(F.col("embedding"), 1, dim).cast("array<double>").alias("b"),
    )
    j = cap.join(img, "image_id")
    # round-9 stabilization on each fold BEFORE the division: the fold
    # order differs between engines, so the raw sums can differ in the
    # last ulp — pinning them at 9 decimals makes the round-6 score
    # bit-identical everywhere (same recipe as the IVF oracle)
    dot = F.round(
        F.aggregate(
            F.zip_with("a", "b", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )
    na = F.sqrt(
        F.round(F.aggregate(F.col("a"), F.lit(0.0), lambda acc, x: acc + x * x), 9)
    )
    nb = F.sqrt(
        F.round(F.aggregate(F.col("b"), F.lit(0.0), lambda acc, x: acc + x * x), 9)
    )
    scored = j.select(
        "image_id", F.round(dot / (na * nb), 6).alias("align_score")
    )
    return scored.withColumn("kept", F.col("align_score") >= threshold)


def ar_bucket_batches(meta: DataFrame, batch_size: int = 32) -> DataFrame:
    """Aspect-ratio bucket batching (the SDXL-style trainer prep step):
    every image lands in one of five AR bands, images within a band are
    packed into fixed-size batches in deterministic image_id order, and
    each batch emits one manifest row. Band edges are decided by integer
    cross-multiplication (w*3 > h*4, not w/h > 4/3) so the bucketing is
    exact in any engine — no float ratio, no log, no rounding mode.

    One shuffle on the band key for the window; the manifest agg reuses
    the same partitioning. Output: (bucket, batch_id, n_images,
    first_id, last_id, avg_ar)."""
    banded = meta.select(
        "image_id",
        "w",
        "h",
        F.when(F.col("w") > 2 * F.col("h"), "ultrawide")
        .when(F.col("w") * 3 > F.col("h") * 4, "wide")
        .when(F.col("h") > 2 * F.col("w"), "ultratall")
        .when(F.col("h") * 3 > F.col("w") * 4, "tall")
        .otherwise("square")
        .alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("image_id")
    packed = banded.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )
    return packed.groupBy("bucket", "batch_id").agg(
        F.count("*").alias("n_images"),
        F.min("image_id").alias("first_id"),
        F.max("image_id").alias("last_id"),
        F.round(F.avg(F.col("w").cast("double") / F.col("h")), 6).alias("avg_ar"),
    )


def pair_corpus_stats(meta: DataFrame) -> DataFrame:
    """Curation dashboard: per (fmt, orientation) pair counts, mean
    resolution and caption length — one map-side-combinable aggregation."""
    shaped = meta.withColumn(
        "orientation",
        F.when(F.col("w") > F.col("h"), "landscape")
        .when(F.col("w") < F.col("h"), "portrait")
        .otherwise("square"),
    )
    return shaped.groupBy("fmt", "orientation").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("w"), 6).alias("avg_w"),
        F.round(F.avg("h"), 6).alias("avg_h"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
    )


def hard_negative_captions(
    docs: DataFrame,
    embeddings: DataFrame,
    dim: int = 32,
    n_planes: int = 8,
    n_bands: int = 2,
) -> DataFrame:
    """Contrastive hard-negative mining for image-caption training: for
    each image, the most-aligned WRONG caption among LSH co-bucketed
    candidates — the in-batch-negatives upgrade every CLIP-style
    training recipe wants (random negatives are too easy; the hard ones
    live nearby in embedding space).

    Candidate generation is SRP banding (dedup.srp_band_signatures'
    fixed Rademacher family) applied to BOTH sides of the shared
    ``dim``-dim space — image = stored embedding's first components,
    caption = the deterministic md5-digit projection caption_alignment
    uses — so a caption is a candidate for an image iff they agree on
    >= 1 band. Exact round-6 cosine ranks candidates; the winner per
    image is max_by(score, tie-break lowest caption id). ``margin`` =
    own-caption alignment minus the hard negative's score: the pairs a
    contrastive loss will find hardest.

    Scale shape: the bucket join's key is (band_id, band_val) —
    candidate volume tracks angular proximity, never n^2; scoring and
    the per-image argmax are map-side-combinable; no UDF, no window.
    Vector norms are computed ONCE per vector (not per candidate pair)
    and joined in — the per-pair work is a single dot product, cutting
    the interpreted higher-order-function cost ~3x at any scale.
    """
    from crawler_spark.operators.dedup import srp_band_signatures

    def _norm(a):
        return F.sqrt(
            F.round(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x), 9)
        )

    cap = caption_projection(docs, dim).withColumn("nc", _norm(F.col("cv")))
    img = embeddings.select(
        F.col("vec_id").alias("image_id"),
        F.slice(F.col("embedding"), 1, dim).cast("array<double>").alias("iv"),
    ).withColumn("ni", _norm(F.col("iv")))
    cap_sig = srp_band_signatures(cap, "cv", "image_id", n_planes, n_bands)
    img_sig = srp_band_signatures(img, "iv", "image_id", n_planes, n_bands)
    cand = (
        img_sig.select(
            F.col("vec_id").alias("image_id"), "band_id", "band_val"
        )
        .join(
            cap_sig.select(
                F.col("vec_id").alias("cap_id"), "band_id", "band_val"
            ),
            ["band_id", "band_val"],
        )
        .filter(F.col("image_id") != F.col("cap_id"))
        .select("image_id", "cap_id")
        .distinct()
    )

    def _cos(a, b, na, nb):
        dot = F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        )
        return F.round(dot / (na * nb), 6)

    neg = (
        cand.join(img, "image_id")
        .join(
            cap.select(F.col("image_id").alias("cap_id"), "cv", "nc"),
            "cap_id",
        )
        .select(
            "image_id",
            "cap_id",
            _cos(
                F.col("iv"), F.col("cv"), F.col("ni"), F.col("nc")
            ).alias("s"),
        )
        .groupBy("image_id")
        .agg(
            F.max_by(
                F.col("cap_id"), F.struct(F.col("s"), -F.col("cap_id"))
            ).alias("neg_id"),
            F.max("s").alias("neg_score"),
        )
    )
    own = (
        img.join(cap, "image_id")
        .select(
            "image_id",
            _cos(
                F.col("iv"), F.col("cv"), F.col("ni"), F.col("nc")
            ).alias("own_score"),
        )
    )
    return neg.join(own, "image_id").select(
        "image_id",
        "neg_id",
        "neg_score",
        "own_score",
        F.round(F.col("own_score") - F.col("neg_score"), 6).alias("margin"),
    )


def with_content_key(
    docs: DataFrame, group: int = 7, n_variants: int | None = None
) -> DataFrame:
    """Deterministic shared-image key over `documents`: every ``group``
    consecutive doc_ids reference the SAME underlying image content
    (md5 of the group index), carrying different captions — the
    synthetic analog of one image re-crawled from many pages, each page
    attaching its own alt-text. Pure integer/md5 arithmetic, portable
    verbatim to the ANSI oracle.

    With ``n_variants`` set, the caption is replaced by one of
    ``n_variants`` deterministic variant strings per image (picked by an
    md5 digit of the doc_id), so captions REPEAT within a group with
    real multiplicities — the shape the modal election is for. Without
    it, the raw document text is the caption (every page its own
    string)."""
    key = (
        f"substring(md5(cast(cast(floor(doc_id / {group}) as bigint) "
        "as string)), 1, 16)"
    )
    if n_variants is None:
        caption = F.col("text")
    else:
        caption = F.expr(
            "concat('v', cast((instr('0123456789abcdef', "
            "substring(md5(cast(doc_id as string)), 6, 1)) - 1) "
            f"% {n_variants} as string), ':', {key})"
        )
    return docs.select(
        F.col("doc_id").alias("image_id"),
        F.expr(key).alias("content_key"),
        caption.alias("caption"),
        F.col("source"),
    )


def caption_canonical(pairs: DataFrame) -> DataFrame:
    """Cross-page caption consolidation (the LAION/DataComp label-noise
    merge): for each distinct image (content_key), elect the MODAL
    caption — highest occurrence count, caption string ascending as the
    deterministic tiebreak — and report the variant profile.

    Output: (content_key, canonical_caption, n_pairs, n_variants,
    canonical_share) — one row per distinct image. `canonical_share`
    < 1.0 flags label-noise candidates: the image's pages disagree on
    what it shows, and a trainer should either take the modal string or
    drop the image.

    Scale: two map-side-combinable aggregations (pairs -> (key, caption)
    counts -> per-key election via max_by over a struct) — no window, no
    self-join, no UDF. The (key, caption) intermediate is bounded by the
    pair count; the election shuffles one row per distinct caption
    variant, never per page. At 10^10 pairs this is exactly the plan a
    100 TB caption merge wants: both shuffles combine map-side, and the
    hot key ceiling is the max variant count of one image, not a global
    sort.

    Reference analog: the crawler's first-duplicate-wins store dedup
    (src/database.py:126-136) collapses repeat encounters of one
    merchant; this is the same collapse where encounters VOTE instead of
    first-wins — the right semantics when later pages carry better
    captions.
    """
    variant_counts = pairs.groupBy("content_key", "caption").agg(
        F.count("*").alias("n")
    )
    # max_by over (n, caption-desc) realizes "count desc, caption asc":
    # negating the count is not enough because the tiebreak runs the
    # OTHER way, so order by struct(n, reversed-caption) via min_by on
    # (-n, caption)
    return (
        variant_counts.groupBy("content_key")
        .agg(
            F.expr(
                "min_by(caption, struct(-n as neg_n, caption))"
            ).alias("canonical_caption"),
            F.sum("n").alias("n_pairs"),
            F.count("*").alias("n_variants"),
            F.max(F.struct(F.col("n"), F.col("caption"))).alias("_top"),
        )
        .select(
            "content_key",
            "canonical_caption",
            "n_pairs",
            "n_variants",
            F.round(
                F.col("_top.n").cast("double") / F.col("n_pairs"), 6
            ).alias("canonical_share"),
        )
    )


def caption_noise_report(pairs: DataFrame) -> DataFrame:
    """Per-source label-noise scorecard built on `caption_canonical`'s
    election: for every (source, image) pair-group, how many of the
    source's pairs carry a NON-canonical caption. The per-feed number a
    curation pipeline uses to decide which crawl sources get their
    captions down-weighted (vs `dup_rate_by_source`, which scores text
    duplication — this scores cross-page caption disagreement).

    Scale: the canonical table is one row per distinct image — joined
    back to pairs on content_key as a plain hash join (broadcastable
    while distinct-images fits, shuffle join beyond), then one map-side
    combinable rollup per source."""
    canon = caption_canonical(pairs).select(
        "content_key", "canonical_caption"
    )
    tagged = pairs.join(canon, "content_key").withColumn(
        "is_noise", (F.col("caption") != F.col("canonical_caption"))
    )
    return tagged.groupBy("source").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("is_noise").cast("long")).alias("n_noise_pairs"),
        F.round(
            F.sum(F.col("is_noise").cast("double")) / F.count("*"), 6
        ).alias("noise_rate"),
    )
