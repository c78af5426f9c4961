"""Deduplication suite over a document corpus — first-class operators for
a large-scale training-data pipeline.

The reference's dedup is an exact-match seen-set probe before insert
(reference: src/database.py:126-136); these operators generalize it to
the near-duplicate families a 100 TB corpus needs. All are pure
DataFrame/SQL compositions (no Python in the hot path) and all hashing is
md5-based so the DuckDB oracle can reproduce results bit-for-bit.

Scale notes
-----------
* exact:       one hash-shuffle on the text key (map-side partial agg).
* minhash-LSH: shingles explode -> per-(doc, band) min-signature agg ->
               self-join on band signature. The join key is (band_id,
               signature), which is high-cardinality and uniform -> no
               skew; candidate pairs ~ true duplicates, not O(n^2).
* simhash:     per-doc fixed 16-dim signature via one explode+agg; exact
               bucket join on the signature (Hamming-0 buckets); at scale,
               split signature into bands for Hamming<=k.
* ngram jaccard: candidate pre-filter via shared-shingle join, exact
               Jaccard verified on the candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per identical text (deterministic
    first-wins, like the reference's store_exists skip)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ------------------------------------------------------------ shingles


def _shingles(docs: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: lowercase, split on
    whitespace, sliding window via native higher-order functions.
    Docs with fewer than n tokens emit no shingles (SQL-oracle-aligned
    edge semantics: exactly len-n+1 grams per doc)."""
    # project the token array ONCE before the lambda: expressions inside
    # higher-order functions are not common-subexpression-eliminated, so
    # referencing the raw split() there re-runs it per element (measured
    # 13x slower on the bigram analog)
    ws = F.col("__ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.trim(F.col(text_col))), "\\s+").alias("__ws"),
        )
        .filter(F.size(ws) >= n)
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


# ------------------------------------------------------------- minhash


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: hash family h_i(s) = md5(i || s); the
    signature element i is min over shingles (lexicographic min of md5 hex
    — portable to any ANSI-SQL oracle). Output: doc_id, band_id, sig.

    Plan shape: all ``n_hashes`` mins are computed as parallel agg
    columns in ONE pass over the shingles (then unpivoted doc-side), not
    by exploding each shingle row n_hashes times first — at corpus scale
    that explode multiplies the aggregation input by n_hashes for zero
    information gain."""
    sh = _shingles(docs, text_col, id_col, shingle_n)
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"_s{i}")
            for i in range(n_hashes)
        ]
    )
    return per_doc.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"_s{i}") for i in range(n_hashes)])).alias(
            "band_id", "sig"
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    min_band_matches: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on >= k of n bands.
    (bands of 1 row each; banding join on (band_id, sig).)"""
    sig = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_n)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
        .filter(F.col("n_bands") >= min_band_matches)
    )


# -------------------------------------------------------------- simhash


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """SimHash-style signature: bit i of the signature is the majority
    vote of token-hash bit i over the doc's distinct tokens. Token-hash
    bit i := hex digit i of md5(token) >= 8 (each md5 hex digit is a
    balanced 4-bit hash; its top bit is a fair coin) — portable SQL."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
        .withColumn("tok_md5", F.md5("tok"))
    )
    # hex digits >= '8' lexicographically are exactly values 8..15 → a
    # fair coin per digit; portable to any SQL oracle. All ``bits`` vote
    # sums run as parallel agg columns in ONE pass over the tokens (no
    # bits-way row explode before the aggregation).
    votes = [
        F.sum(
            F.when(F.substring("tok_md5", i + 1, 1) >= "8", F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"_v{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(bits):
        term = (F.col(f"_v{i}") > 0).cast("long") * F.lit(1 << i)
        sig = term if sig is None else sig + term
    return per_doc.select("doc_id", sig.alias("simhash"))


def simhash64_band_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    band_bits: int = 16,
) -> DataFrame:
    """64-bit SimHash as ``n_bands`` x ``band_bits`` banded signatures —
    the corpus-scale form. A single 16-bit signature space (65,536
    values) collides massively at 10^10 docs; 64 bits with banded
    Hamming<=k joins is the standard fix (Manku et al., WWW'07).

    Global bit k (k = 16*band + i, i little-endian within the band) is
    the majority vote over the doc's distinct tokens of bit (k mod 4)
    of hex digit (k div 4) of ONE md5(token) — the classic
    one-hash-per-token SimHash (Charikar '02 as deployed by Manku
    WWW'07): md5's 128 bits are independent fair coins, so slicing 64
    of them gives the same guarantee as 4 independent per-band hashes
    at a quarter of the hashing cost and with NO band explode — the
    vote aggregation reads one row per (doc, token), with all 64 bit
    votes as parallel agg columns in a single map-side-combinable
    groupBy(doc_id).

    Output: (doc_id, band_id, band_val) — one 16-bit int per band, so
    banded joins need no bit-slicing downstream.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
        .withColumn("h", F.md5("tok"))
    )
    n_bits = n_bands * band_bits
    # one digit-value expression per hex digit, 4 vote columns each —
    # whole-stage codegen evaluates the shared substring/instr once
    digits = [
        F.expr(
            f"instr('0123456789abcdef', substring(h, {d + 1}, 1)) - 1"
        )
        for d in range((n_bits + 3) // 4)
    ]
    votes = [
        F.sum(
            (F.shiftright(digits[k // 4], k % 4) % 2 * 2 - 1).cast("int")
        ).alias(f"_v{k}")
        for k in range(n_bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    band_vals = []
    for b in range(n_bands):
        val = None
        for i in range(band_bits):
            term = (
                F.col(f"_v{band_bits * b + i}") > 0
            ).cast("long") * F.lit(1 << i)
            val = term if val is None else val + term
        band_vals.append(val.alias(f"_band{b}"))
    wide = per_doc.select("doc_id", *band_vals)
    # unpivot the n_bands columns back to the (doc_id, band_id,
    # band_val) contract — n_bands rows per doc, built map-side
    stack = ", ".join(
        f"{b}, _band{b}" for b in range(n_bands)
    )
    return wide.select(
        "doc_id",
        F.expr(f"stack({n_bands}, {stack}) AS (band_id, band_val)"),
    ).select("doc_id", F.col("band_id").cast("int").alias("band_id"), "band_val")


def simhash64_hamming_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs with 64-bit SimHash Hamming distance <= k.

    Candidate generation is EXACT for k < n_bands by pigeonhole: <= 3
    differing bits cannot touch all 4 bands, so every qualifying pair
    agrees exactly on at least one 16-bit band — the banded equi-join
    finds it without any O(n^2) comparison. Candidates then verify the
    true 64-bit Hamming distance via per-band xor + bit_count.
    """
    # the signature build (distinct-token explode x n_bands md5 votes)
    # dominates this operator's cost; localCheckpoint materializes it
    # ONCE for the three consumers below (band join's two sides + the
    # verify) instead of re-running the vote pipeline per subtree
    sig = simhash64_band_signatures(
        docs, text_col, id_col, n_bands, band_bits
    ).localCheckpoint(eager=True)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify against a WIDE one-row-per-doc signature (n_bands columns):
    # halves the verify-join fan-out (1 row per side instead of n_bands)
    # and removes the per-pair groupBy shuffle entirely — the Hamming
    # distance is a map-side xor/bit_count fold over the band columns
    wide = sig.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(F.col("band_id") == i, F.col("band_val"))
            ).alias(f"_b{i}")
            for i in range(n_bands)
        ]
    )
    wa = wide.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"_b{i}").alias(f"_a{i}") for i in range(n_bands)],
    )
    wb = wide.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"_b{i}").alias(f"_c{i}") for i in range(n_bands)],
    )
    ham = sum(
        F.bit_count(F.col(f"_a{i}").bitwiseXOR(F.col(f"_c{i}")))
        for i in range(n_bands)
    )
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_dup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Docs sharing an identical simhash signature (Hamming-0 buckets)."""
    sig = simhash_signatures(docs, text_col, id_col, bits)
    return (
        sig.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def shingle_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Broder CONTAINMENT (public SEQUENCES'97, alongside resemblance):
    c(A,B) = |S(A) ∩ S(B)| / min(|S(A)|, |S(B)|) — the asymmetric
    near-dup signal Jaccard structurally misses. A short doc quoted
    whole inside a long one has tiny Jaccard (the union is dominated by
    the long doc) but containment 1.0; dedup cascades run containment
    to catch subset pages, syndicated excerpts, and boilerplate-wrapped
    copies that resemblance-based passes wave through.

    Same scale shape as ngram_jaccard_pairs: shared-shingle self-join
    candidate pre-filter (the O(n²) cross product never materializes),
    one (doc_a, doc_b) intersection agg, two broadcast-size size joins.
    """
    sh = _shingles(docs, text_col, id_col, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .withColumn(
            "containment",
            F.round(
                F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b")), 6
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "containment")
    )


def minhash_banded_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Proper (b, r) MinHash banding: b bands of r rows each; candidates
    agree on ALL r rows of at least one band. Collision probability is
    the classic S-curve 1-(1-s^r)^b — r=1 bands (every shared shingle a
    candidate) flood the join at corpus scale; r>=2 suppresses the
    low-similarity mass. The band join key is the md5 of the r
    concatenated row signatures: high-cardinality, uniform, no skew."""
    sh = _shingles(docs, text_col, id_col, shingle_n)
    n_hashes = n_bands * rows_per_band
    # all n_hashes row-mins as parallel agg columns in one pass (no
    # n_hashes-way explode), then each band's signature is the md5 of its
    # r row sigs concatenated in hash_id order — column order is already
    # deterministic, no collect_list/sort dance needed
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"_s{i}")
            for i in range(n_hashes)
        ]
    )
    band_sigs = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"_s{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            )
        )
        for b in range(n_bands)
    ]
    bands = per_doc.select(
        "doc_id", F.posexplode(F.array(*band_sigs)).alias("band_id", "band_sig")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


# ------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard >= threshold, computed as
    |A ∩ B| / (|A| + |B| - |A ∩ B|) via a shared-shingle self-join —
    only docs sharing at least one shingle ever pair up (the candidate
    pre-filter), so the O(n^2) cross product never materializes.

    ``max_df`` caps shingle document frequency in the CANDIDATE join
    only: a shingle appearing in > max_df docs ("the end of the" at
    corpus scale) would alone contribute ~df^2/2 join pairs — classic
    hot-key skew. Capped shingles still count toward the exact Jaccard
    (sizes and intersections use the full shingle sets); they just can't
    be the sole reason two docs pair up, so a pair sharing ONLY
    ultra-common shingles is below any useful threshold anyway and its
    loss is principled, while the join's worst key is bounded at
    max_df^2."""
    sh = _shingles(docs, text_col, id_col, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        cand_sh = sh.join(rare, "shingle")
        cand = (
            cand_sh.alias("a")
            .join(
                cand_sh.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
        # exact intersection over the FULL shingle sets of candidates
        sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            cand.join(sa, "doc_a")
            .join(sb, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
        return (
            inter.join(
                sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"),
                "doc_a",
            )
            .join(
                sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"),
                "doc_b",
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------- embedding cosine near-dup


def srp_band_signatures(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Signed-random-projection (SRP / random-hyperplane) LSH signatures,
    banded like MinHash (Charikar, STOC'02).

    Hyperplane p's weight for dimension d is a deterministic Rademacher
    ±1 drawn from md5(p || '_' || d) — a fixed literal family, so any
    ANSI-SQL oracle reproduces it bit-for-bit and no plane table ships
    with the job. Bit p of a vector's signature = sign(v · h_p); bits
    group into ``n_bands`` bands of ``n_planes/n_bands`` bits.

    This replaces coarse first-k-dimension sign bucketing: 8 fixed
    buckets put ~n^2/8 pairs in each bucket at corpus scale, while SRP
    banding's collision probability tracks the cosine angle, so
    candidate volume tracks true near-duplicates.

    Cost: one explode of n·dim·n_planes vote rows + two aggs — linear in
    data size, shuffle keyed by (vec, plane): no skew.
    """
    band_bits = n_planes // n_bands
    elems = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))

    def w(p: int):  # Rademacher ±1 for (plane, dimension) — fixed literal family
        h = F.md5(F.concat(F.lit(f"{p}_"), F.col("pos").cast("string")))
        return F.when(F.substring(h, 1, 1) >= "8", F.lit(1.0)).otherwise(F.lit(-1.0))

    # all n_planes dot products as parallel agg columns in ONE pass over
    # the vector elements — no n_planes-way row explode multiplying the
    # aggregation input 16x before the shuffle
    per_vec = elems.groupBy("vec_id").agg(
        *[F.sum(F.col("x") * w(p)).alias(f"_d{p}") for p in range(n_planes)]
    )
    band_vals = []
    for b in range(n_bands):
        val = None
        for i in range(band_bits):
            term = (F.col(f"_d{b * band_bits + i}") >= 0).cast("long") * F.lit(1 << i)
            val = term if val is None else val + term
        band_vals.append(val)
    return per_vec.select(
        "vec_id", F.posexplode(F.array(*band_vals)).alias("band_id", "band_val")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.35,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicates: SRP band signatures generate
    candidates (pairs agreeing on >= 1 band), exact cosine verifies.
    Native expressions only — no UDFs."""
    sig = srp_band_signatures(emb, vec_col, id_col, n_planes, n_bands)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
        )

    # norms once per VECTOR (not per candidate pair): the per-pair work
    # below is a single dot product — same floats, ~3x less fold cost
    va = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    ).withColumn("na", norm(F.col("va")))
    vb = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    dot = F.aggregate(
        F.zip_with(
            F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def srp_multiprobe_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.35,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Multi-probe SRP LSH (Lv et al., VLDB'07 applied to random
    hyperplanes): near-threshold pairs that straddle ONE hyperplane are
    exactly the ones plain banding misses — and the bit most likely to
    be wrong is the one with the smallest |margin| (the vector sits
    closest to that plane). Each vector therefore probes with its
    original band value AND the value with its lowest-margin bit
    flipped: recall rises like adding a second hash table, for zero
    extra index size (the index side stores originals only).

    Determinism upgrade over ``srp_band_signatures``: every dot product
    accumulates round-9 DECIMAL terms, so margins (and hence both the
    sign bits and the argmin flip choice) are order-independent and
    bit-identical in the SQL oracle — a float sum's partition-order
    1-ulp wobble could otherwise flip a near-zero margin's sign.
    Argmin ties break toward the lowest bit index.

    Same scale shape as the base operator: one explode (n·dim rows),
    one agg with n_planes parallel decimal sums, probe join keyed by
    (band_id, band_val) — candidates track true near-duplicates, and
    exact cosine verifies every candidate."""
    band_bits = n_planes // n_bands
    elems = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))

    def w(p: int):
        h = F.md5(F.concat(F.lit(f"{p}_"), F.col("pos").cast("string")))
        return F.when(F.substring(h, 1, 1) >= "8", F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )

    # hyperplane signs depend only on (plane, pos): evaluate the 16
    # md5/when expressions ONCE on the dim-row plane dimension and
    # broadcast it in, so the per-element codegen is 16 bare products
    # instead of 16 md5+branch chains (compile time and per-row cost
    # both drop). localCheckpoint then materializes the aggregate once
    # for BOTH sides of the probe join — measured ~2x on the shipped
    # query end to end
    planes = elems.select("pos").distinct().select(
        "pos", *[w(p).alias(f"_w{p}") for p in range(n_planes)]
    )
    per_vec = (
        elems.join(F.broadcast(planes), "pos")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(
                    F.round(F.col("x") * F.col(f"_w{p}"), 9).cast(
                        "decimal(18,9)"
                    )
                ).alias(f"_d{p}")
                for p in range(n_planes)
            ]
        )
        .localCheckpoint(eager=True)
    )
    probes = []  # (band_id, probe_id, band_val expr)
    for b in range(n_bands):
        val = None
        for i in range(band_bits):
            term = (
                F.col(f"_d{b * band_bits + i}") >= 0
            ).cast("long") * F.lit(1 << i)
            val = term if val is None else val + term
        absd = [F.abs(F.col(f"_d{b * band_bits + i}")) for i in range(band_bits)]
        m = F.least(*absd)
        # mask = 1 << argmin(|margin|); the when-chain's first match is
        # the lowest bit index, the oracle's ORDER BY (abs(dot), p) twin
        mask = None
        for i in range(band_bits):
            cond = absd[i] == m
            mask = (
                F.when(cond, F.lit(1 << i))
                if mask is None
                else mask.when(cond, F.lit(1 << i))
            )
        flipped = val.bitwiseXOR(mask.cast("long"))
        probes.append((b, 0, val))
        probes.append((b, 1, flipped))
    sig = per_vec.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.lit(pid).alias("probe_id"),
                        v.alias("band_val"),
                    )
                    for b, pid, v in probes
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.band_id", "s.probe_id", "s.band_val")
    index = sig.filter(F.col("probe_id") == 0).select(
        "vec_id", "band_id", "band_val"
    )
    cand = (
        sig.alias("a")
        .join(
            index.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.least("a.vec_id", "b.vec_id").alias("id_a"),
            F.greatest("a.vec_id", "b.vec_id").alias("id_b"),
        )
        .distinct()
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
        )

    # norms once per VECTOR, joined in — per-pair work is the dot alone
    va = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    ).withColumn("na", norm(F.col("va")))
    vb = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    dot = F.aggregate(
        F.zip_with(
            F.col("va"), F.col("vb"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine", F.round(dot / (F.col("na") * F.col("nb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------- 64-bit signature Hamming


def hamming64_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig64",
    max_hamming: int = 7,
    n_bands: int = 8,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit signature column (perceptual image
    hash, SimHash, feature fingerprint) with Hamming distance <=
    ``max_hamming``.

    Candidate generation is EXACT by pigeonhole when ``max_hamming <
    n_bands``: k differing bits cannot touch all n_bands bands, so every
    qualifying pair agrees on at least one whole band — the banded
    equi-join finds it with no O(n^2) comparison. Candidates carry both
    full signatures through the join, so verification is a single native
    ``bit_count(xor)`` with no second lookup join.

    Scale: the join key (band_id, band_val) is high-cardinality for
    non-degenerate signatures; output ~ true near-dups. The classic use
    is image dedup over the crawl results table's phash column
    (reference stores one image per merchant row, dedup by exact
    store_exists only — src/database.py:126-136; this is the
    corpus-scale generalization).
    """
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftrightunsigned(F.col("sig"), b * bits)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    bands = (
        sigs.select(F.col(id_col).alias("doc_id"), F.col(sig_col).alias("sig"))
        .select("doc_id", "sig", F.explode(band_arr).alias("bv"))
        .select("doc_id", "sig", "bv.band_id", "bv.band_val")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def hamming64_join(
    probe: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "sig64",
    max_hamming: int = 7,
    n_bands: int = 8,
) -> DataFrame:
    """Asymmetric banded Hamming join: each PROBE signature against an
    INDEX catalog — the incremental shape a crawl runs every wave
    (this wave's image hashes vs the persisted all-time signature
    table) instead of re-self-joining history. Same pigeonhole
    exactness as hamming64_pairs (max_hamming < n_bands ⇒ every
    qualifying pair shares a whole band); candidate keys are
    (band_id, band_val), high-cardinality, and the join is
    probe-sized — O(|wave|), not O(|corpus|), per round.

    Returns (probe_id, index_id, hamming), hamming <= max_hamming.
    """
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    bits = 64 // n_bands
    mask = (1 << bits) - 1

    def _bands(df, out_id):
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.shiftrightunsigned(F.col("sig"), b * bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("band_val"),
                )
                for b in range(n_bands)
            ]
        )
        return (
            df.select(
                F.col(id_col).alias(out_id), F.col(sig_col).alias("sig")
            )
            .select(out_id, "sig", F.explode(band_arr).alias("bv"))
            .select(out_id, "sig", "bv.band_id", "bv.band_val")
        )

    p = _bands(probe, "probe_id").withColumnRenamed("sig", "psig")
    ix = _bands(index, "index_id").withColumnRenamed("sig", "isig")
    return (
        p.join(ix, ["band_id", "band_val"])
        .select(
            "probe_id",
            "index_id",
            F.bit_count(F.col("psig").bitwiseXOR(F.col("isig"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------- duplicate clusters


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "minlabel",
) -> DataFrame:
    """Connected components over candidate near-dup pairs: every doc that
    appears in a pair is labeled with the MINIMUM doc id reachable
    through the pair graph — the canonical "keep one per duplicate
    cluster" reduction that follows any LSH family's candidate output.

    Algorithm: iterative min-label propagation. Each round every node
    takes min(own label, neighbors' labels); the component minimum
    travels one hop per round, so rounds = graph diameter — near-dup
    clusters are shallow (dups of dups of one source), typically <= 3-4
    hops. Each round is one shuffle join + one aggregation, and
    ``localCheckpoint`` truncates the lineage so plans stay flat.
    Labels only ever decrease, so the fixpoint test is one narrow
    aggregate — sum(label) unchanged (decimal(38) accumulator: no int64
    overflow at 10^10 x 64-bit ids) — instead of a join against the
    previous labels. At web scale the same loop is the standard Spark
    CC construction; for adversarially long chains swap in
    large-star/small-star (Kiveris et al., SoCC'14) — identical
    interface, fewer rounds.

    Output: (doc_id, cluster_id) for every doc appearing in ``pairs``.

    ``algorithm="star"`` dispatches to large-star/small-star contraction
    (``operators/graph.cc_star``) — same interface and output, O(log
    diameter) rounds instead of one hop per round; pick it when
    duplicate chains run long (test_graph pins the equivalence).
    """
    if algorithm == "star":
        from crawler_spark.operators.graph import cc_star

        return cc_star(pairs, a_col=a_col, b_col=b_col, max_iter=max_iter)
    if algorithm != "minlabel":
        raise ValueError("algorithm must be 'minlabel' or 'star'")
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    label_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)"))
    ).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        if new_sum == label_sum:
            break
        label_sum = new_sum
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


# ----------------------------------------------- exact substring overlap


def substring_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Exact-substring duplicate detection (the distributed analog of
    suffix-array dedup in Lee et al., "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499): two docs sharing an exact
    run of L >= ``window`` consecutive tokens share L - window + 1
    consecutive token windows of length ``window``, so fingerprinting
    every window and self-joining on the fingerprint finds every exact
    overlap of at least ``window`` tokens — no suffix array, no global
    sort, one shuffle on the window key.

    Distinct from the Jaccard/MinHash family above: those measure
    *set* similarity of shingles; this detects *contiguous* verbatim
    spans (boilerplate, quoted passages, mirrored paragraphs) that can
    sit inside otherwise-dissimilar documents.

    Output: (doc_a, doc_b, n_shared) where n_shared counts DISTINCT
    shared windows; a single shared run of length L contributes
    L - window + 1 of them, so ``min_shared=k`` asks for an overlap of
    at least window + k - 1 tokens (or k scattered window-sized hits).

    Scale: the join key is md5(window) — 128-bit, high-cardinality,
    uniform (and bit-identical in the DuckDB oracle, so a collision
    cannot cause parity divergence). Corpus-scale hot windows
    ("click here to subscribe" boilerplate) are the same hot-shingle
    skew as ngram_jaccard_pairs; cap them with a DF filter there if a
    real corpus shows a head — here windows >= 5 tokens are already
    long enough to be rare.
    """
    win = _shingles(docs, text_col, id_col, window).select(
        "doc_id", F.md5("shingle").alias("w_md5")
    )
    return (
        win.alias("a")
        .join(
            win.alias("b"),
            (F.col("a.w_md5") == F.col("b.w_md5"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ------------------------------------------------------------- winnowing


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS plagiarism-detector algorithm): hash every
    k-token gram, slide a window of ``w`` consecutive gram hashes, and
    in each window select the MINIMUM hash (ties -> rightmost
    position). The selected (hash, position) set is the document's
    fingerprint sketch, with two guarantees the paper proves:

    * any shared token run of length >= w + k - 1 between two documents
      shares at least one selected fingerprint (no long verbatim overlap
      is ever missed), and
    * no run shorter than k is ever matched (noise floor).

    Expected density is 2/(w+1) of all grams — a tunable, position-aware
    sketch that is much smaller than the full window set
    ``substring_overlap_pairs`` fingerprints, which is what makes it the
    right exact-overlap index at corpus scale.

    Dataflow: token split -> (pos, md5(gram)) via one native
    transform(sequence) explode -> per-doc window min over ``w`` rows ->
    distinct. The only shuffle is the doc-partitioned window (doc-sized
    partitions, never skewed); the tie rule rides inside the min key:
    ``md5 || '#' || lpad(99999999 - pos)`` makes lexicographic min =
    (min hash, then rightmost position), bit-identical in the DuckDB
    oracle. Only full windows select (pos <= n_grams - w), per the
    paper; docs with fewer than k + w - 1 tokens emit no fingerprints.

    Returns (doc_id, n_grams, fp, fp_pos) — one row per distinct
    selected fingerprint.
    """
    ws = F.col("__ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - k + 1),
        lambda i: F.struct(
            (i - 1).cast("long").alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(ws, i, k))).alias("g"),
        ),
    )
    keyed = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.trim(F.col(text_col))), "\\s+").alias("__ws"),
        )
        .filter(F.size(ws) >= k)
        .select(
            "doc_id",
            (F.size(ws) - k + 1).cast("long").alias("n_grams"),
            F.explode(grams).alias("gr"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("gr.pos").alias("pos"),
            F.concat(
                F.col("gr.g"),
                F.lit("#"),
                F.lpad((F.lit(99999999) - F.col("gr.pos")).cast("string"), 8, "0"),
            ).alias("key"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        keyed.withColumn("fp_key", F.min("key").over(win))
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select("doc_id", "n_grams", "fp_key")
        .distinct()
        .select(
            "doc_id",
            "n_grams",
            F.substring("fp_key", 1, 32).alias("fp"),
            (F.lit(99999999) - F.substring("fp_key", 34, 8).cast("long"))
            .cast("long")
            .alias("fp_pos"),
        )
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """Verbatim-overlap candidate pairs from winnowed fingerprints: join
    documents on shared selected HASHES (position-independent — the
    paper's matching step), count distinct shared fingerprints. By the
    winnowing guarantee, every doc pair sharing a token run of length
    >= w + k - 1 appears here — at ~2/(w+1) of the index size (and the
    join fan-out) of the full-window ``substring_overlap_pairs``.

    Same scale shape as every LSH pair family above: one self-join on a
    uniform 128-bit key, candidates proportional to true overlaps."""
    fps = winnow_fingerprints(docs, text_col, id_col, k, w).select(
        "doc_id", "fp"
    ).distinct()
    return (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ------------------------------------------------- content-defined chunks


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_mod: int = 8,
) -> DataFrame:
    """Content-defined chunking (Rabin-style, the backup-dedup technique
    applied to text): a token starts a new chunk when its hash lands in
    the boundary class (md5 first hex digit % boundary_mod == 0), so
    chunk boundaries move WITH the content — an insertion early in a
    page reshuffles fixed-size blocks but leaves content-defined chunks
    downstream of it identical, which is what makes CDC find shared
    spans across near-duplicate pages that block hashing misses.

    Returns (id, chunk_idx, chunk_md5, n_tokens) — one row per chunk.
    Dataflow: posexplode tokens -> boundary flag -> running boundary
    count (window partitioned BY DOC, ordered by position: partitions
    are doc-sized, never skewed) -> per-chunk agg re-using the same
    partitioning. Chunk text is reassembled order-exactly via
    sort_array(collect_list(struct(pos, token))).
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(
                F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " "
            )
        ).alias("pos", "tok"),
    ).withColumn(
        "is_boundary",
        (
            F.expr(
                "instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1"
            )
            % boundary_mod
            == 0
        ).cast("int"),
    )
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = toks.withColumn("chunk_idx", F.sum("is_boundary").over(w))
    return (
        chunked.groupBy("id", "chunk_idx")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
            F.count("*").alias("n_tokens"),
        )
    )


def semdedup(
    emb: DataFrame,
    n_cells: int = 8,
    tau: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication by
    within-cluster cosine similarity. Cluster the embeddings, compare
    pairs ONLY inside a cluster, and where a pair exceeds ``tau`` keep
    the member farther from its centroid (the paper's best-performing
    keep-low-centroid-similarity rule), so prototypical near-copies are
    pruned and the kept set stays diverse.

    Removal rule (deterministic, per-point — no connected components):
    x is removed iff some same-cell y has round9-cos(x, y) >= tau and
    (csim_y, y_id) < (csim_x, x_id) lexicographically, i.e. y precedes x
    in the cluster's keep order (centroid-similarity asc, id tie-break).

    Clustering reuses the IVF machinery (hash-seeded mean centroids +
    broadcast nearest-centroid assignment, similarity.py) — at corpus
    scale n_cells grows ∝ n so the within-cell pair work stays
    O(n · cell_size) with a bounded cell size; the pair join keys on
    cell_id, a balanced key by construction of the hash seeding.

    Output: (vec_id, cell_id, csim, removed) for every vector.
    """
    from crawler_spark.operators.similarity import (
        _dot,
        _norm,
        assign_cells,
        make_centroids,
    )

    cents = make_centroids(emb, n_cells, vec_col, id_col)
    cells = assign_cells(emb, cents, vec_col, id_col)
    # referenced by both sides of the pair join AND the final left join:
    # persist, or the centroid crossJoin lineage runs three times
    scored = cells.join(F.broadcast(cents), "cell_id").select(
        "vec_id",
        "cell_id",
        F.col("v"),
        F.round(
            _dot(F.col("v"), F.col("centroid"))
            / (_norm(F.col("v")) * _norm(F.col("centroid"))),
            9,
        ).alias("csim"),
    ).persist()
    # cast to double BEFORE multiplying: float32 products lose enough
    # precision to flip a round(.., 9) vs the all-double oracle
    def _d(c):
        return F.aggregate(
            c, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")
        )

    # self-norm once per VECTOR (the pair join below would otherwise
    # re-run both norm folds for every within-cell pair)
    scored = scored.withColumn("nv", F.sqrt(_d(F.col("v"))))
    a = scored.select(
        F.col("vec_id").alias("id_a"), F.col("cell_id").alias("cell_a"),
        F.col("v").alias("va"), F.col("csim").alias("csim_a"),
        F.col("nv").alias("na"),
    )
    b = scored.select(
        F.col("vec_id").alias("id_b"), F.col("cell_id").alias("cell_b"),
        F.col("v").alias("vb"), F.col("csim").alias("csim_b"),
        F.col("nv").alias("nb"),
    )
    pair_cos = F.round(
        F.aggregate(
            F.zip_with(
                F.col("va"), F.col("vb"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        / (F.col("na") * F.col("nb")),
        9,
    )
    removed_ids = (
        a.join(
            b,
            (F.col("cell_a") == F.col("cell_b"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .filter(pair_cos >= F.lit(tau))
        .filter(
            (F.col("csim_b") < F.col("csim_a"))
            | ((F.col("csim_b") == F.col("csim_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return (
        scored.join(removed_ids, "vec_id", "left")
        .select(
            "vec_id",
            "cell_id",
            "csim",
            F.coalesce(F.col("_rm"), F.lit(False)).alias("removed"),
        )
    )


# ------------------------------------------------- b-bit minwise / OPH


def bbit_pair_estimate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    b_hex: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """b-bit minwise hashing (Li & Koenig, WWW'10): keep only the lowest
    b bits of each of the k minhash values and estimate Jaccard from the
    fraction of matching b-bit slots, J_hat = (A - C) / (1 - C) with
    collision floor C = 2^-b. At corpus scale this stores a 2-hex-char
    (b = 8 bit) slot instead of a full 128-bit minhash — 16x smaller
    sketches for the same k — which is the difference between a sketch
    table that fits executor memory and one that doesn't. Evaluated over
    adjacent-id doc pairs (the post-LSH candidate-verification shape:
    estimate J from STORED sketches, never re-shingling the raw text)
    against the exact shingle Jaccard. One pass computes all k mins as
    parallel agg columns; the pair join is on doc_id — no all-pairs
    blowup anywhere.

    Output: doc_a, doc_b, n_match, j_est, j_exact.
    """
    b_bits = 4 * b_hex
    c = 1.0 / (2 ** b_bits)
    sh = _shingles(docs, text_col, id_col, shingle_n)
    # k mins in ONE aggregation pass; slot i keeps only the trailing
    # b_hex chars of the min md5 (the "lowest b bits" of the minhash)
    per_doc = sh.groupBy("doc_id").agg(
        F.count("*").alias("n_sh"),
        *[
            F.substring(
                F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))),
                33 - b_hex,
                b_hex,
            ).alias(f"_b{i}")
            for i in range(n_hashes)
        ],
    )
    a = per_doc.alias("a")
    b = per_doc.alias("b")
    n_match = sum(
        F.when(F.col(f"a._b{i}") == F.col(f"b._b{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    inter = (
        sh.alias("sa")
        .join(
            sh.alias("sb"),
            (F.col("sa.doc_id") + 1 == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy(F.col("sa.doc_id").alias("doc_a"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .join(inter, F.col("a.doc_id") == F.col("doc_a"), "left")
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            n_match.cast("int").alias("n_match"),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    (n_match / F.lit(float(n_hashes)) - F.lit(c))
                    / F.lit(1.0 - c),
                ),
                6,
            ).alias("j_est"),
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (
                    F.col("a.n_sh")
                    + F.col("b.n_sh")
                    - F.coalesce(F.col("n_inter"), F.lit(0))
                ),
                6,
            ).alias("j_exact"),
        )
    )


def oph_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bins: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Densified one-permutation hashing (Li/Owen/Zhang NIPS'12 +
    Shrivastava/Li ICML'14 rotation densification): ONE hash evaluation
    per shingle — the shingle's md5 is bucketed into k bins by its last
    hex digit and the min md5 within each bin is the bin's raw value —
    versus classic k-minhash's k hash families. At 100 TB that is the
    difference between one min-agg column per bin filled by a single
    pass and k full passes' worth of hashing CPU. Empty bins (sparse
    docs) borrow the value of the nearest non-empty bin to the RIGHT
    (circular), carrying the rotation distance t so borrowed bins stay
    distinguishable — the densified estimator J_hat = (matching bins)/k
    stays unbiased.

    Plan: one shuffle (groupBy doc_id, bin), then the densification is
    pure per-doc array work via higher-order functions — map lookup +
    first-non-null scan, no second shuffle, no UDF.

    Output: doc_id, bin, t, sig.
    """
    sh = _shingles(docs, text_col, id_col, shingle_n)
    binmins = (
        sh.select(
            "doc_id",
            F.expr(
                "instr('0123456789abcdef', substring(md5(shingle), 32, 1)) - 1"
            ).cast("int").alias("bin"),
            F.md5(F.col("shingle")).alias("h"),
        )
        .groupBy("doc_id", "bin")
        .agg(F.min("h").alias("v"))
    )
    per_doc = binmins.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bin"), F.col("v")))
        ).alias("m")
    )
    k = F.lit(n_bins)
    # two-step: first resolve t per bin, then look the source bin up —
    # keeps the lambda nesting shallow enough for codegen
    with_t = per_doc.select(
        "doc_id",
        "m",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bins - 1)),
                lambda j: F.element_at(
                    F.filter(
                        F.sequence(F.lit(0), F.lit(n_bins - 1)),
                        lambda t: F.element_at(
                            F.col("m"), ((j + t) % k).cast("int")
                        ).isNotNull(),
                    ),
                    1,
                ),
            )
        ).alias("bin", "t"),
    )
    return with_t.select(
        "doc_id",
        F.col("bin").cast("int").alias("bin"),
        F.col("t").cast("int").alias("t"),
        F.element_at(
            F.col("m"), ((F.col("bin") + F.col("t")) % k).cast("int")
        ).alias("sig"),
    )


def oph_pair_estimate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bins: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Densified-OPH Jaccard estimator over adjacent-id doc pairs:
    J_hat = (# bins whose densified (t, sig) agree) / k. Join is on
    doc_id + bin — linear in docs, never all-pairs.

    Output: doc_a, doc_b, n_match, j_est.
    """
    sig = oph_signatures(docs, text_col, id_col, n_bins, shingle_n)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") + 1 == F.col("b.doc_id"))
            & (F.col("a.bin") == F.col("b.bin")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("a.t") == F.col("b.t"))
                    & (F.col("a.sig") == F.col("b.sig")),
                    1,
                ).otherwise(0)
            ).cast("int").alias("n_match")
        )
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            F.round(F.col("n_match") / F.lit(float(n_bins)), 6).alias("j_est"),
        )
    )


# --------------------------------------------- prefix-filter (PPJoin)


def prefix_filter_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    with_stats: bool = False,
) -> DataFrame:
    """AllPairs/PPJoin prefix filtering (Bayardo et al. WWW'07, Xiao et
    al. WWW'08): exact Jaccard >= threshold with a candidate join over
    token PREFIXES instead of full shingle sets.

    Under a global token order (ascending document frequency, ties by
    shingle string — rarest first), any pair with J(x,y) >= t must share
    a token inside BOTH prefixes of length |x| - ceil(t*|x|) + 1: if all
    shared tokens sat past x's prefix, the intersection would fit in the
    suffix of size ceil(t*|x|) - 1 < t*|x| <= |x ∩ y|. So joining
    prefix-vs-prefix loses nothing, while the join input shrinks from
    every (doc, shingle) row to ~(1-t)·|x| rows per doc — at t=0.8
    that's 5x fewer probe rows and, because prefixes hold the RAREST
    tokens, the candidate blowup on hot shingles ("the end of the")
    disappears entirely: the hottest keys never enter the join. The
    length filter (t*|x| <= |y| <= |x|/t, both implied by J >= t) prunes
    survivors before the exact-verify join over full sets.

    This is the scale-critical upgrade over ngram_jaccard_pairs'
    shared-shingle join: same exact output, candidate set smaller by
    orders of magnitude on skewed corpora — the published all-pairs
    algorithm used at web scale. with_stats=True returns one row
    (n_cand_prefix, n_pairs) instead of the pairs, for the
    efficiency-audit query.
    """
    sh = _shingles(docs, text_col, id_col, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    pre = (
        sh.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(
            F.col("pos")
            <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select("doc_id", "shingle", "n_sh")
    )
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J >= t forces t*|a| <= |b| and t*|b| <= |a|
            & (F.col("b.n_sh") >= F.lit(threshold) * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= F.lit(threshold) * F.col("b.n_sh")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    pairs = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    if not with_stats:
        return pairs
    return cand.agg(F.count("*").alias("n_cand_prefix")).crossJoin(
        pairs.agg(F.count("*").alias("n_pairs"))
    )


# ---------------------------------------------------- edit-distance join


def ed_join_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q: int = 3,
    k: int = 12,
    m: int = 4,
    with_stats: bool = False,
) -> DataFrame:
    """Ed-Join (Xiao et al. VLDB'08): all pairs with Levenshtein distance
    <= k, via q-gram prefix filtering + native banded-DP verify.

    One edit operation changes at most q of a string's positional
    q-grams, so ed(x,y) <= k implies at most k*q DISTINCT q-grams of x
    are absent from y's gram set (a vanished distinct gram needs >= 1 of
    its occurrences destroyed, and k edits destroy <= k*q occurrences).
    Under a global total order on grams (ascending document frequency,
    ties by gram — rarest first), consider a pair with ed <= k where at
    least one side has >= k*q+1 grams: if that side's k*q+1-gram prefix
    missed the other's FULL set entirely it would contradict the k*q
    bound, so some prefix gram g is in the other's set — and g lands in
    the other's PREFIX too (a set with >= k*q+1 grams keeps every
    element <= its prefix end under the shared order; a smaller set's
    prefix IS its whole set). So prefix-vs-prefix loses nothing for any
    pair with a "long" side, and the join never touches more than
    k*q+1 grams per string regardless of length — on a 10^10-doc corpus
    the probe side is O(k*q) rows/doc of the RAREST grams, so hot
    boilerplate grams never enter the join.

    The count refinement (generalized prefix-overlap lemma): with
    prefixes extended to k*q + m grams, any qualifying pair must share
    at least greatest(1, least(m, |G(x)|-k*q, |G(y)|-k*q)) prefix grams
    — the intersection |G(x) ∩ G(y)| >= |G(x)| - k*q can place at most
    |G(x)| - (k*q+m) of its elements past x's prefix, so >= m of them
    sit inside BOTH prefixes (each is <= the earlier prefix end, hence
    inside the other prefix under the shared order). On corpora whose
    char-gram vocabulary is small (every gram hot), requiring m shared
    prefix grams instead of 1 is what keeps the candidate set
    proportional to true near-dups; the group-count replaces the
    distinct() the m=1 form needed anyway — same shuffle, no extra pass.

    Pairs where BOTH sides have <= k*q grams (strings of <= k*q - q + 1
    chars) get no guarantee — two tiny strings can be within ed k with
    disjoint gram sets (any two strings of length <= k are!). Those go
    through a separate short path: an equi-join on a length band of
    width k+1 (each side also probes its neighbor bands, so every pair
    passing the length filter meets on a key). Quadratic within a band,
    but semantically unavoidable — at ed <= k, short strings really are
    pairwise near-duplicates in droves; at scale this path holds only
    the <= 3 bands below ~k*q chars. Strings are padded with q-1 copies
    of sentinel chars (chr(1)/chr(2)) so strings shorter than q still
    emit grams.

    Survivors pass the length filter (ed >= abs(len difference)), then
    the exact verify uses Spark's threshold-banded levenshtein (O(k*n)
    per pair, not O(n^2)).

    Comparison is over lower(trim(text)) — the same case-insensitive
    normalization the Jaccard family uses. with_stats=True returns one
    row (n_cand_prefix, n_pairs) for the efficiency audit.
    """
    pad_l, pad_r = "\x01" * (q - 1), "\x02" * (q - 1)
    norm = F.lower(F.trim(F.col(text_col)))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        norm.alias("__t"),
        F.length(norm).alias("n_chars"),
        F.concat(F.lit(pad_l), norm, F.lit(pad_r)).alias("__p"),
    ).filter(F.length("__t") > 0)
    p = F.col("__p")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(p) - q + 1),
            lambda i: F.substring(p, i, q),
        )
    )
    gr = base.select("doc_id", "n_chars", F.explode(grams).alias("gram"))
    dfreq = gr.groupBy("gram").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "gram")
    pre = (
        gr.join(dfreq, "gram")
        .withColumn("pos", F.row_number().over(w))
        .withColumn(
            "n_grams", F.max("pos").over(Window.partitionBy("doc_id"))
        )
        .filter(F.col("pos") <= k * q + m)
        .select("doc_id", "gram", "n_chars", "n_grams")
    )
    cand_long = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: ed(x,y) >= abs(|x| - |y|)
            & (F.col("b.n_chars") >= F.col("a.n_chars") - k)
            & (F.col("a.n_chars") >= F.col("b.n_chars") - k),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count("*").alias("n_shared"),
            F.first(F.col("a.n_grams")).alias("ga"),
            F.first(F.col("b.n_grams")).alias("gb"),
        )
        .filter(
            F.col("n_shared")
            >= F.greatest(
                F.lit(1),
                F.least(
                    F.lit(m),
                    F.col("ga") - k * q,
                    F.col("gb") - k * q,
                ),
            )
        )
        .select("doc_a", "doc_b")
    )
    # short path: both sides under k*q grams — no prefix guarantee, so
    # meet on a length band of width k+1 (probe own + neighbor bands)
    short_th = k * q - q + 1
    shorts = base.filter(F.col("n_chars") <= short_th).select(
        "doc_id", "n_chars", (F.col("n_chars") / (k + 1)).cast("long").alias("band")
    )
    probe = shorts.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    cand_short = shorts.alias("a").join(
        probe.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("b.n_chars") >= F.col("a.n_chars") - k)
        & (F.col("a.n_chars") >= F.col("b.n_chars") - k),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    cand = cand_long.unionByName(cand_short).distinct()
    ta = base.select(F.col("doc_id").alias("doc_a"), F.col("__t").alias("__ta"))
    tb = base.select(F.col("doc_id").alias("doc_b"), F.col("__t").alias("__tb"))
    pairs = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        # threshold-banded DP: returns -1 when the distance exceeds k
        .withColumn("ed", F.levenshtein("__ta", "__tb", k))
        .filter(F.col("ed") >= 0)
        .select("doc_a", "doc_b", "ed")
    )
    if not with_stats:
        return pairs
    return cand.agg(F.count("*").alias("n_cand_prefix")).crossJoin(
        pairs.agg(F.count("*").alias("n_pairs"))
    )


def weighted_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 1,
) -> DataFrame:
    """Weighted (multiset) Jaccard similarity join: J_w(x,y) =
    sum_t min(c_x(t), c_y(t)) / sum_t max(c_x(t), c_y(t)) over word
    COUNTS — the min-max kernel (Ioffe ICML'10's exact target). Set
    Jaccard treats "spam spam spam spam" and "spam" as identical;
    the weighted form scores repetition-inflated template pages
    honestly, which is why count-aware dedup is the right gate for
    boilerplate-heavy web text.

    Exactness: counts are integers, and sum(max) = total_x + total_y -
    sum(min), so the score is a ratio of int64s — engine-exact modulo
    one final round. Candidates come from a shared-token join with
    per-pair sum(min) computed IN the join aggregate (min of the two
    counts per shared token); only candidates reach the threshold
    test. Same scale shape as the set-Jaccard family: candidate count
    ~ docs sharing tokens, never O(n^2). The join key's selectivity is
    what bounds output, so ``shingle_n`` controls the token unit: on a
    small-vocabulary (template/synthetic) corpus unigrams are ALL hot
    and the join degenerates — word n-grams (with multiplicity, the
    multiset analog of _shingles) restore high-cardinality keys while
    keeping count semantics. For realistic vocabularies the exact
    further cure is the prefix-filter principle prefix_filter_pairs
    uses (it generalizes to weighted overlap); a df cap is the
    standard approximation — approximate because dropping a token
    shifts both sides of the ratio.
    """
    ws = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), "\\s+"),
        lambda t: F.length(t) > 0,
    )
    arr = F.col("__ws")
    unit = arr if shingle_n == 1 else F.transform(
        F.sequence(F.lit(1), F.size(arr) - shingle_n + 1),
        lambda i: F.concat_ws(" ", F.slice(arr, i, shingle_n)),
    )
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), ws.alias("__ws"))
        .filter(F.size("__ws") >= shingle_n)
        .select("doc_id", F.explode(unit).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    totals = toks.groupBy("doc_id").agg(F.sum("c").alias("total"))
    inter = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.least(F.col("a.c"), F.col("b.c"))).alias("n_min"))
    )
    return (
        inter.join(
            totals.select(F.col("doc_id").alias("doc_a"), F.col("total").alias("ta")),
            "doc_a",
        )
        .join(
            totals.select(F.col("doc_id").alias("doc_b"), F.col("total").alias("tb")),
            "doc_b",
        )
        .withColumn(
            "jw",
            F.round(
                F.col("n_min") / (F.col("ta") + F.col("tb") - F.col("n_min")),
                6,
            ),
        )
        .filter(F.col("jw") >= threshold)
        .select("doc_a", "doc_b", "jw")
    )


# ------------------------------------------- sorted-neighborhood (SNM)


def snm_candidate_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 4,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD '95):
    sort the corpus by a blocking key, slide a window of `window` rows,
    and emit every pair that co-occurs in some window — O(n * window)
    candidates instead of the O(n^2) cross join, catching near-dups
    whose keys sort adjacently even when they hash apart (the failure
    mode of exact-key blocking).

    Spark-first shape: the global sort rank comes from
    operators/sequence.assign_dense_seq (range-shuffle + per-partition
    row_number + broadcast offsets — NO single-partition window), and
    the "slide" is an explode of gap 1..window-1 followed by an
    EQUI-join on rank+gap — a plain shuffle join on a dense unique
    int64, perfectly balanced at any scale. Candidate verification
    (similarity on the pair) is the caller's second stage, exactly like
    the LSH families above.

    Returns (id_a, key_a, id_b, key_b, gap) with rank(a) < rank(b).
    The caller owns nothing: the ranked input is localCheckpoint-ed
    (eager) so both passes over it (left and right side of the gap
    join) read the same frozen rows, and assign_dense_seq's
    range-partition persist handle is released here immediately — the
    checkpoint blocks themselves are reclaimed by Spark's
    ContextCleaner once the returned plan is garbage-collected, so no
    state outlives the caller's use of the result.
    """
    from crawler_spark.operators.sequence import assign_dense_seq

    if int(window) < 2:
        raise ValueError(
            f"snm_candidate_pairs needs window >= 2, got {window}: a "
            "1-row window has no neighbor gaps (and F.sequence(1, 0) "
            "would silently step -1 and emit gap-0 self-pairs)"
        )
    ranked, _n, _handle = assign_dense_seq(
        df.select(F.col(key_col).alias("k"), F.col(id_col).alias("i")),
        ["k", "i"],
        "_rnk",
    )
    ranked = ranked.localCheckpoint(eager=True)
    _handle.unpersist()
    left = ranked.withColumn(
        "gap", F.explode(F.sequence(F.lit(1), F.lit(int(window) - 1)))
    ).select(
        (F.col("_rnk") + F.col("gap")).alias("_rnk"),
        F.col("i").alias("id_a"),
        F.col("k").alias("key_a"),
        "gap",
    )
    right = ranked.select(
        "_rnk", F.col("i").alias("id_b"), F.col("k").alias("key_b")
    )
    return left.join(right, "_rnk").select(
        "id_a", "key_a", "id_b", "key_b", "gap"
    )


def fs_match_scores(
    pairs: DataFrame,
    fields: list[tuple[str, float, float]],
    upper: float = 4.0,
    lower: float = 0.0,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969) — the
    decision layer that turns blocking candidates (SNM / LSH) into
    match verdicts: each field contributes ln(m/u) when it AGREES and
    ln((1-m)/(1-u)) when it disagrees (m = P(agree | match), u =
    P(agree | non-match)), the log-likelihood-ratio score sums the
    contributions, and the two-threshold rule classifies match /
    possible / non-match (the "possible" band is what goes to manual
    or expensive review — exactly the role the exact-verify stage
    plays in the LSH families here).

    ``pairs`` must carry one BOOLEAN column per field; ``fields`` =
    [(col, m, u), ...] with literal m/u (estimated offline — EM or
    labeled samples; literals keep the operator deterministic and the
    oracle exact). Weights are pinned to the 1e-9 grid and summed in
    fixed order — a pure map stage over the candidate set, no shuffle.

    Returns the input plus (score, decision).
    """
    import math

    from crawler_spark.functions.num import pin9

    terms = []
    for col, m, u in fields:
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"need 0 < u < m < 1 for field {col!r}")
        agree_w = math.floor(math.log(m / u) * 1e9 + 0.5) / 1e9
        dis_w = math.floor(math.log((1 - m) / (1 - u)) * 1e9 + 0.5) / 1e9
        terms.append(
            F.when(F.col(col), F.lit(agree_w)).otherwise(F.lit(dis_w))
        )
    score = sum(terms[1:], terms[0])
    return pairs.withColumn("score", pin9(score)).withColumn(
        "decision",
        F.when(F.col("score") >= upper, F.lit("match"))
        .when(F.col("score") < lower, F.lit("non_match"))
        .otherwise(F.lit("possible")),
    )


def fs_em_fit(
    pairs: DataFrame,
    field_cols: list[str],
    n_iter: int = 3,
    p0: float = 0.2,
    m0: float = 0.8,
    u0: float = 0.2,
) -> DataFrame:
    """EM estimation of the Fellegi-Sunter m/u parameters (Winkler
    1988) — the learning step fs_match_scores above deliberately leaves
    offline: given blocking candidates with boolean agreement columns,
    fit m_j = P(agree_j | match), u_j = P(agree_j | non-match) and the
    match proportion p by expectation-maximization over the AGREEMENT-
    PATTERN table (conditional-independence model).

    Scale shape: the candidate set is aggregated ONCE into at most
    2^f pattern rows (f = len(field_cols)); every EM iteration then
    touches only that dimension-sized table — an E-step posterior per
    pattern (one-row param frame cross-joined in) and an M-step
    aggregate back to a one-row param frame. Nothing is collected; at
    10^10 candidates the single pattern-count aggregation is the only
    full shuffle.

    Determinism: posteriors are pinned to the 1e-9 grid and SCALED TO
    int64 before the M-step, so every EM sum is integer arithmetic
    (order-independent, engine-exact); the new parameters are single
    pinned divisions of those integers. The SQL oracle unrolls the
    identical iterations. Scale note: the scaled sums are bounded by
    N_candidates * 1e9, so int64 holds to ~9.2e9 candidates — past
    that, swap the M-step sums to DECIMAL(38,0) (the pattern table
    itself stays <= 2^f rows at any scale).

    Returns one row per field: (field, m, u, p) after n_iter rounds.
    """
    f = len(field_cols)
    if not 1 <= f <= 8:
        raise ValueError("fs_em_fit expects 1..8 agreement fields")

    def pin9(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    pat = (
        pairs.groupBy(*field_cols)
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    spark = pairs.sparkSession
    par = spark.createDataFrame(
        [tuple([float(p0)] + [float(m0)] * f + [float(u0)] * f)],
        ", ".join(
            ["p double"]
            + [f"m{j} double" for j in range(f)]
            + [f"u{j} double" for j in range(f)]
        ),
    )
    n_tot = pat.agg(F.sum("n").alias("nn"))
    for _ in range(n_iter):
        pm = F.lit(1.0)
        pu = F.lit(1.0)
        for j, col in enumerate(field_cols):
            pm = pm * F.when(F.col(col), F.col(f"m{j}")).otherwise(
                F.lit(1.0) - F.col(f"m{j}")
            )
            pu = pu * F.when(F.col(col), F.col(f"u{j}")).otherwise(
                F.lit(1.0) - F.col(f"u{j}")
            )
        w9 = F.floor(
            (F.col("p") * pm)
            / (F.col("p") * pm + (F.lit(1.0) - F.col("p")) * pu)
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long")
        scored = pat.crossJoin(F.broadcast(par)).select(
            *field_cols, "n", w9.alias("w9")
        )
        aggs = [
            F.sum(F.col("n") * F.col("w9")).alias("s_w"),
            F.sum(F.col("n") * (F.lit(1000000000) - F.col("w9"))).alias("s_nw"),
        ]
        for j, col in enumerate(field_cols):
            g = F.when(F.col(col), F.lit(1)).otherwise(F.lit(0))
            aggs.append(F.sum(F.col("n") * F.col("w9") * g).alias(f"s_w_g{j}"))
            aggs.append(
                F.sum(
                    F.col("n") * (F.lit(1000000000) - F.col("w9")) * g
                ).alias(f"s_nw_g{j}")
            )
        sums = scored.agg(*aggs)
        sel = [
            pin9(
                F.col("s_w").cast("double")
                / (F.col("nn").cast("double") * F.lit(1e9))
            ).alias("p")
        ]
        for j in range(f):
            sel.append(
                pin9(
                    F.col(f"s_w_g{j}").cast("double")
                    / F.col("s_w").cast("double")
                ).alias(f"m{j}")
            )
        for j in range(f):
            sel.append(
                pin9(
                    F.col(f"s_nw_g{j}").cast("double")
                    / F.col("s_nw").cast("double")
                ).alias(f"u{j}")
            )
        par = sums.crossJoin(F.broadcast(n_tot)).select(*sel)
    outs = []
    for j, col in enumerate(field_cols):
        outs.append(
            par.select(
                F.lit(col).alias("field"),
                F.col(f"m{j}").alias("m"),
                F.col(f"u{j}").alias("u"),
                F.col("p").alias("p"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def cws_signatures(
    docs: DataFrame,
    k: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Consistent weighted sampling signatures (Ioffe, ICML 2010 —
    ICWS): the weighted-Jaccard SKETCH next to weighted_jaccard_pairs'
    exact join. Classic minhash treats a page that repeats "cheap
    pills" 500 times the same as one mention; ICWS samples each sketch
    slot with probability proportional to the feature's WEIGHT, so two
    docs' slot-k samples collide with probability exactly J_w =
    sum(min w)/sum(max w) — the repetition-honest similarity — while
    the sketch stays k slots regardless of document size.

    Per slot and feature, Ioffe's construction: r, c ~ Gamma(2,1)
    (= -ln(u·u')), beta ~ U(0,1), all derived from md5(slot:feature) —
    the same uniforms for every document (consistency is what makes
    collisions meaningful), engine-exact dyadic rationals. Then
    t = floor(ln w / r + beta), y = exp(r(t - beta)), a = c/(y·exp(r)),
    and the slot's sample is the PAIR (argmin-a feature, its t) —
    Ioffe's theorem makes two docs' slot samples collide with
    probability EXACTLY J_w. Dropping t (Li'15's "0-bit" shortcut) is
    only safe when weight ratios are mild: with a 50x-repeated token
    the argmin feature alone still collides (observed est 0.42 against
    true J_w 0.04), while t = floor(ln w / r + beta) carries the
    weight and restores the exact collision law. a is pinned to 1e-9
    with feature-asc ties. Everything is native expressions — one
    explode to (doc, feature, w), one slot fan-out, one (doc, slot)
    min-struct aggregation; no Python anywhere.

    Returns (doc_id, slot, feature, t) — k rows per doc.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(
                    F.split(
                        F.regexp_replace(
                            F.lower(F.trim(F.col(text_col))), r"\s+", " "
                        ),
                        " ",
                    ),
                    lambda x: x != "",
                )
            ).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("w"))
    )
    fan = toks.select(
        "doc_id",
        "tok",
        "w",
        F.explode(F.expr(f"sequence(0, {int(k) - 1})")).alias("slot"),
    )

    def pin9(c):
        return F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)

    def u_from(i: int):
        # 4 md5 hex chars -> dyadic uniform (x + 0.5) / 65536, exact
        return (
            F.conv(F.substring(F.col("_h"), 4 * i - 3, 4), 16, 10)
            .cast("long")
            .cast("double")
            + F.lit(0.5)
        ) / F.lit(65536.0)

    # STAGED columns, one expensive expression per stage: expr trees
    # don't CSE, and Catalyst's CollapseProject keeps a projection
    # whose (non-cheap) output is referenced more than once downstream
    # — without the stages every u_i re-hashes md5 and the a-chain
    # re-expands t and r several times over
    st = fan.withColumn(
        "_h",
        F.md5(
            F.concat(
                F.lit("cws"),
                F.col("slot").cast("string"),
                F.lit(":"),
                F.col("tok"),
            )
        ),
    )
    st = st.select(
        "*",
        pin9(-(F.log(u_from(1)) + F.log(u_from(2)))).alias("_r"),
        pin9(-(F.log(u_from(3)) + F.log(u_from(4)))).alias("_c"),
        u_from(5).alias("_beta"),
        pin9(F.log(F.col("w").cast("double"))).alias("_lnw"),
    )
    st = st.select(
        "*", F.floor(F.col("_lnw") / F.col("_r") + F.col("_beta")).alias("_t")
    )
    st = st.select(
        "*",
        pin9(F.exp(F.col("_r") * (F.col("_t") - F.col("_beta")))).alias("_y"),
        pin9(F.exp(F.col("_r"))).alias("_er"),
    )
    st = st.select(
        "*", pin9(F.col("_c") / (F.col("_y") * F.col("_er"))).alias("_a")
    )
    return (
        st.select(
            "doc_id",
            "slot",
            F.struct(
                F.col("_a").alias("a"),
                F.col("tok").alias("feature"),
                F.col("_t").cast("long").alias("t"),
            ).alias("s"),
        )
        .groupBy("doc_id", "slot")
        .agg(F.min("s").alias("s"))
        .select(
            "doc_id",
            "slot",
            F.col("s.feature").alias("feature"),
            F.col("s.t").alias("t"),
        )
    )


def cws_pair_estimate(
    sigs: DataFrame,
    k: int = 16,
    min_match: int = 1,
) -> DataFrame:
    """Weighted-Jaccard estimates from CWS signatures: pairs sharing
    >= ``min_match`` full (slot, feature, t) samples, scored
    matches/k. One equi-join on the (slot, feature, t) key. A single
    shared sample is weak evidence on stopword-heavy text (every doc
    pair shares SOME high-df token at t=0, so min_match=1 degenerates
    toward all-pairs — observed on the test corpus); min_match=2 is
    the r=2 banding analog, and true banding (concatenate slot groups
    into one join key, exactly like minhash_banded_pairs) is the
    10^10-doc path. Returns (doc_a, doc_b, n_match, est_jw6)."""
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), "slot", "feature", "t"
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), "slot", "feature", "t"
    )
    return (
        a.join(b, ["slot", "feature", "t"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_match"))
        .filter(F.col("n_match") >= int(min_match))
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            (
                F.floor(
                    F.col("n_match").cast("double")
                    / F.lit(float(k))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("est_jw6"),
        )
    )
