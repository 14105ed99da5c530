"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes (100 TB posture):
- Everything is built from ``explode`` + hash + ``groupBy`` aggregations —
  JVM-side, whole-stage-codegen-able; no Python UDFs.
- MinHash signatures use k independent hash functions implemented as
  seeded ``xxhash64(i, shingle_hash)`` chains — pure JVM hashing, no 64-bit
  arithmetic that could overflow under ANSI mode (the driver's session runs
  with ``spark.sql.ansi.enabled=true``, Spark 4's default, so any
  ``a*x+b mod p`` scheme with x near 2^61 would raise ARITHMETIC_OVERFLOW).
  Uncapped signatures are SHUFFLE-FREE (per-row ``array_min`` over a
  ``transform`` — a pure projection); only the stop-shingle-capped variant
  pays one groupBy shuffle for corpus doc frequencies. SimHash
  fingerprints are likewise per-row HOF reductions. LSH banding turns the
  quadratic candidate search into an equi-join on (band_id, band_hash) —
  the classic Broder/MMDS scheme.
- "Keep one per duplicate cluster" uses the min-id-neighbor rule (a doc is
  dropped iff it has a candidate neighbor with a smaller id). This is the
  scalable approximation of connected components: one extra join instead of
  an iterative CC. For exact cluster semantics use
  ``connected_components`` (hash-min label propagation, below).
- Common-shingle cap (``max_shingle_df``) bounds the posting-list blowup on
  skewed shingles — at scale a stop-shingle filter is the difference
  between a join and an explosion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .lineage import release_plan_blocks

# ---------------------------------------------------------------- exact (D1)
def exact_dedup(
    df: DataFrame,
    keys: list[str],
    order_by: str | None = None,
    keep: str = "first",
    unique_order: bool = False,
) -> DataFrame:
    """Exact dedup on ``keys``; with ``order_by``, keep the first/last row
    per key by that ordering (deterministic). Without it, an arbitrary
    single row per key (``dropDuplicates`` — one shuffle, map-side
    partial aggregation).

    ``unique_order=True`` is the 100 TB form when ``order_by`` is unique
    within every key group (a row id): keep-first/last becomes a
    map-side-combinable MIN/MAX aggregation + a semi-join on (keys,
    extreme) — no per-key window, so a hot key (millions of identical
    normalized texts in a real corpus) never serializes its whole
    cluster through one window task. With ties in ``order_by`` it would
    keep every tied row, hence opt-in.

    Null handling matches the window path: NULL key values form their own
    group (null-safe join), and NULL ``order_by`` values sort first for
    ``keep="first"`` (Spark's ``asc`` default) and last for
    ``keep="last"`` (``desc`` default)."""
    if order_by is None:
        return df.dropDuplicates(keys)
    if unique_order:
        if keep == "first":
            # asc nulls-first: the winner is NULL iff the group has one.
            ext = (
                F.min(
                    F.struct(
                        F.col(order_by).isNotNull().alias("nn"),
                        F.col(order_by).alias("v"),
                    )
                )
                .getField("v")
                .alias(order_by)
            )
        else:
            # desc nulls-last: max() already skips NULLs.
            ext = F.max(order_by).alias(order_by)
        reps = df.groupBy(*keys).agg(ext)
        cond = [df[c].eqNullSafe(reps[c]) for c in [*keys, order_by]]
        return df.join(reps, cond, "left_semi")
    ob = F.col(order_by).asc() if keep == "first" else F.col(order_by).desc()
    w = Window.partitionBy(*keys).orderBy(ob)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------- shingles
def shingle_col(text_col: str | Column, n: int = 3) -> Column:
    """Word-level n-gram shingles as an array<string> column (distinct).

    Pure SQL expression: split → slide via transform over index sequence
    — no UDF. The token array is let-bound (``exprs.let_``) so the
    per-gram slice reads a bound lambda variable; an inlined split()
    would re-run the regex for every gram under interpreted HOFs —
    O(tokens²) per row (the d04j lesson).
    """
    from .exprs import let_

    toks = F.split(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col), r"\s+")

    def _grams(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)))
        )

    return let_(toks, _grams)


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, max_shingle_df: int | None
) -> DataFrame:
    """(id, shingle_hash) pairs; optionally drop shingles appearing in more
    than ``max_shingle_df`` docs (stop-shingle skew guard)."""
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingle_col(text_col, n)).alias("__sh"),
    ).withColumn("__h", F.xxhash64("__sh")).drop("__sh")
    if max_shingle_df is not None:
        hot = (
            ex.groupBy("__h")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("__h")
        )
        ex = ex.join(F.broadcast(hot), "__h", "left_anti")
    return ex


# ---------------------------------------------------------------- MinHash (D2)
def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(id, sig: array<bigint>).

    Each hash function i is ``xxhash64(i, shingle_hash)`` — an ANSI-safe
    seeded rehash with no multiplication to overflow int64.

    Without ``max_shingle_df`` the signature is SHUFFLE-FREE: shingle
    hashes stay an array column and each minhash is an ``array_min`` over
    a per-row ``transform`` — pure projection, embarrassingly parallel at
    corpus scale. The stop-shingle cap genuinely needs corpus-wide doc
    frequencies, so that path keeps the explode + single groupBy with
    ``num_hashes`` min-aggregations (one shuffle)."""
    if max_shingle_df is None:
        hs = F.transform(
            shingle_col(text_col, shingle_size), lambda g: F.xxhash64(g)
        )
        # Single pass over the shingle array: fold each hash into all
        # num_hashes running minima at once (zip_with against the literal
        # seed array). Same values as the previous 64×(transform+array_min)
        # form — xxhash64(i, h) per component, signed min — but one array
        # traversal instead of 64: measured 3.8× faster at sf0.1. An empty
        # shingle array cannot occur (shingle_col emits ≥1 gram), so the
        # Long.MAX init never leaks into a signature.
        seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
        sig = F.aggregate(
            F.col("__hs"),
            F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes),
            lambda acc, h: F.zip_with(
                acc, seeds, lambda m, sd: F.least(m, F.xxhash64(sd, h))
            ),
        )
        return df.select(F.col(id_col), hs.alias("__hs")).select(
            F.col(id_col), sig.alias("sig")
        )
    ex = _exploded_shingles(df, id_col, text_col, shingle_size, max_shingle_df)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = ex.groupBy("__id").agg(*aggs)
    return sig.select(
        F.col("__id").alias(id_col),
        F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"),
    )


def _collapse_identical(
    keyed: DataFrame, id_col: str, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """Split ``keyed`` (one row per doc with an exact dedup key — a full
    MinHash signature or SimHash fingerprint) into:

    - ``uniq``: one representative row (min id) per distinct key
    - ``star``: (id_a=rep, id_b=member) pairs linking every non-rep member
      to its representative — LINEAR in cluster size where the naive
      bucket self-join is quadratic.

    This is the hot-bucket guard's first line: real pretraining corpora
    contain clusters of thousands of byte-identical documents (boilerplate,
    mirrors); identical text ⇒ identical signature, so collapsing before
    banding removes the dominant quadratic source losslessly for keep-one
    dedup semantics (every member is linked to the min-id rep, and the rep
    carries the cluster into the banded join)."""
    w = Window.partitionBy(key_col)
    tagged = keyed.withColumn("__rep", F.min(id_col).over(w))
    uniq = tagged.filter(F.col(id_col) == F.col("__rep")).drop("__rep")
    star = (
        tagged.filter(F.col(id_col) != F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return uniq, star


def _drop_hot_buckets(
    buckets: DataFrame, bucket_cols: list[str], max_bucket_size: int
) -> DataFrame:
    """Remove rows in buckets with more than ``max_bucket_size`` members —
    the degenerate-bucket safety rail. A window count reuses the same hash
    partitioning the subsequent self-join needs, so the guard adds no extra
    shuffle of the (already compact) signature frame. Use
    ``lsh_bucket_stats`` to see what a given cap would drop."""
    w = Window.partitionBy(*bucket_cols)
    return (
        buckets.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def lsh_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Bucket-size distribution of the MinHash LSH banding: (band, bh,
    size) for every bucket with ≥2 members, descending. The candidate pair
    count of a bucket is size·(size-1)/2 — run this before a large
    ``minhash_near_dup_pairs`` job to pick ``max_bucket_size`` (dropped
    candidates are exactly the pairs inside buckets over the cap)."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_size)
    buckets = _band_buckets_frame(sig, id_col, num_hashes, bands)
    return (
        buckets.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") >= 2)
        .orderBy(F.col("size").desc(), "band", "bh")
    )


def _band_buckets_frame(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    rows_per_band = num_hashes // bands
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.col("sig"), F.explode(band_arr).alias("bb")).select(
        id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    jaccard_threshold: float | None = None,
    max_shingle_df: int | None = None,
    max_bucket_size: int | None = None,
    materialize_signatures: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via LSH banding; if
    ``jaccard_threshold`` is set, verify with estimated Jaccard
    (signature agreement fraction) and attach ``est_jaccard``.

    ``materialize_signatures`` selects between two equivalent physical
    shapes (identical output rows either way — mode-equivalence tested):

    - True (default, the corpus-scale shape): persist the compact
      (id, sig) frame so the shingle explode + 64-way min fold — the
      expensive pass over the raw TEXT — runs ONCE; the banded self-join
      then runs SLIM ((id, band, bh), ~24 bytes/row — the (band, bh)
      shuffle never carries a 64-long array per bucket row) and the
      est verification joins the cached sig frame back by id, bounded
      by the deduped candidate count. Minimal folds AND minimal shuffle
      bytes; signatures are 64 longs/doc, ~100× smaller than the text.
    - False (persist-free, for prepared-plan reuse / embedding in a
      larger statement): no cache is available to rejoin, so the bucket
      frame CARRIES the signatures through a SHUFFLE_MERGE-hinted
      self-join and est is computed at the join (before the pair dedup
      — est depends only on the pair, so dedup-after is equivalent).
      The merge hint makes both join sides byte-identical exchanges,
      which Spark's ReuseExchange collapses — the fold still runs only
      ONCE (a broadcast join would break that reuse and recompute the
      fold per side; measured 1.6× slower at sf0.1 despite the cheaper
      join). Shuffle carries bands× the signature bytes — the trade for
      not caching.

    ``max_bucket_size`` is the 100 TB safety rail against degenerate
    corpora (thousands of near-identical docs collapsing into one band
    bucket → one quadratic join task). When set: (1) docs with IDENTICAL
    full signatures are pre-collapsed to a min-id representative and
    emitted as linear star pairs (est_jaccard 1.0) — exact-duplicate
    clusters of any size cost O(cluster), and pair output for a cluster is
    the star to its representative rather than the full clique (equivalent
    for keep-one dedup: every member still has a smaller-id neighbor);
    (2) any residual band bucket with more than ``max_bucket_size``
    DISTINCT signatures is dropped from candidate generation (inspect with
    ``lsh_bucket_stats``). Unset → exact legacy behavior."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    from pyspark import StorageLevel

    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_size, max_shingle_df
    )
    cached: list[DataFrame] = []
    if materialize_signatures:
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(sig)
    star = None
    if max_bucket_size is not None:
        pre = sig
        sig, star = _collapse_identical(sig, id_col, "sig")
        if materialize_signatures:
            # The pre-collapse cache exists only so the shingle fold runs
            # ONCE while both derived frames (collapsed sig + star pairs)
            # materialize; populate them eagerly, then release it so
            # repeated calls don't accumulate superseded MEMORY_AND_DISK
            # blocks in the session.
            sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
            star = star.persist(StorageLevel.MEMORY_AND_DISK)
            sig.count()
            star.count()
            pre.unpersist(False)
            cached = [sig, star]
        star = star.withColumn("est_jaccard", F.lit(1.0))
    def _agree(a, b):
        return (
            F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda v: v))
            / F.lit(num_hashes)
        ).alias("est_jaccard")

    buckets = _band_buckets_frame(sig, id_col, num_hashes, bands)
    if materialize_signatures:
        # slim join + est-after-dedup against the cached sig frame
        buckets = buckets.drop("sig")
        if max_bucket_size is not None:
            buckets = _drop_hot_buckets(buckets, ["band", "bh"], max_bucket_size)
        left = buckets.alias("a")
        right = buckets.alias("b")
        cand = (
            left.join(
                right,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("__sa"))
        sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("__sb"))
        pairs = cand.join(sa, "id_a").join(sb, "id_b").select(
            "id_a", "id_b", _agree(F.col("__sa"), F.col("__sb"))
        )
    else:
        # persist-free: sig rides the merge-hinted self-join (identical
        # exchanges -> ReuseExchange -> one fold), est at the join,
        # dedup afterwards on (id_a, id_b, est) scalars
        if max_bucket_size is not None:
            buckets = _drop_hot_buckets(buckets, ["band", "bh"], max_bucket_size)
        buckets = buckets.hint("merge")
        left = buckets.alias("a")
        right = buckets.alias("b")
        pairs = (
            left.join(
                right,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                _agree(F.col("a.sig"), F.col("b.sig")),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    if jaccard_threshold is not None:
        pairs = pairs.filter(F.col("est_jaccard") >= jaccard_threshold)
    if star is not None:
        pairs = pairs.unionByName(star)
    # Materialized mode: the returned (lazy) frame reads through these
    # caches, so the operator cannot unpersist them itself — the caller
    # owns their lifetime. Release with ``release_signature_caches(result)``
    # after the terminal action (or rely on session teardown).
    pairs._bds_cached = cached  # type: ignore[attr-defined]
    return pairs


def release_signature_caches(df: DataFrame) -> int:
    """Unpersist the signature frames a ``materialize_signatures=True``
    call cached for ``df`` (propagated through ``minhash_dedup``); returns
    the number of frames released. No-op for persist-free mode."""
    n = 0
    for frame in getattr(df, "_bds_cached", []):
        frame.unpersist(False)
        n += 1
    return n


def _keeper_losers(
    pairs: DataFrame, df: DataFrame, id_col: str, keep_by: str
) -> DataFrame:
    """Loser ids under the quality-aware keeper rule: for every candidate
    pair the loser is the doc LATER in ``(-keep_by, id)`` order — the
    keeper is the best-quality copy, ties broken to the smaller id
    (``keep_by = -id`` therefore reproduces the plain min-id rule
    exactly). Same one-hop shape as the min-id collapse: no window, no
    CC round; two equi-joins attach the scores to the (bounded)
    candidate-pair relation, never the other way around."""
    q = df.select(
        F.col(id_col), F.col(keep_by).cast("double").alias("__q")
    )
    scored = pairs.join(
        q.select(F.col(id_col).alias("id_a"), F.col("__q").alias("__qa")),
        "id_a",
    ).join(
        q.select(F.col(id_col).alias("id_b"), F.col("__q").alias("__qb")),
        "id_b",
    )
    ka = F.struct((-F.col("__qa")).alias("nq"), F.col("id_a").alias("i"))
    kb = F.struct((-F.col("__qb")).alias("nq"), F.col("id_b").alias("i"))
    return scored.select(
        F.when(ka < kb, F.col("id_b")).otherwise(F.col("id_a")).alias(id_col)
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int | None = None,
    materialize_signatures: bool = True,
    keep_by: str | None = None,
) -> DataFrame:
    """Keep-one near-dedup: drop any doc with a candidate neighbor of
    smaller id (scalable CC approximation — see module docstring).
    ``max_bucket_size``: hot-bucket guard, see ``minhash_near_dup_pairs``
    (keep-one semantics are preserved under the guard's signature
    collapse — every collapsed member keeps a smaller-id star neighbor).

    ``keep_by``: production dedup keeps the BEST copy, not the min-id
    copy — name a numeric quality column and each candidate pair drops
    the doc later in ``(-keep_by, id)`` order instead (deterministic;
    ``keep_by`` on a ``-id`` column reproduces the default byte-for-
    byte). Cost: two extra equi-joins of the bounded pair relation
    against the (id, score) projection."""
    pairs = minhash_near_dup_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_size,
        jaccard_threshold, max_bucket_size=max_bucket_size,
        materialize_signatures=materialize_signatures,
    )
    # no .distinct() on the loser keys: LEFT ANTI ignores build-side
    # duplicates, so the extra aggregation stage would only add a shuffle
    if keep_by is None:
        losers = pairs.select(F.col("id_b").alias(id_col))
    else:
        losers = _keeper_losers(pairs, df, id_col, keep_by)
    out = df.join(losers, id_col, "left_anti")
    out._bds_cached = getattr(pairs, "_bds_cached", [])  # type: ignore[attr-defined]
    return out


def minhash_dedup_against(
    new_df: DataFrame,
    corpus_df: DataFrame | None,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    jaccard_threshold: float = 0.8,
    corpus_sig: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dedup — the crawl-refresh shape: drop rows of
    ``new_df`` that near-duplicate the EXISTING corpus (any est-Jaccard
    ≥ threshold band-mate), then keep-one within the new batch itself.

    The corpus side is never self-joined and never rewritten: pass
    ``corpus_sig`` = a persisted ``minhash_signatures`` frame (id, sig)
    — e.g. a managed signature table maintained alongside the corpus —
    and only the NEW batch is shingled/hashed this run. At 100 TB the
    per-refresh cost is O(|new| + matched buckets), not O(corpus): band
    buckets are equi-join keys, so corpus bucket rows shuffle once on
    (band, bh) against the (small) new batch; with a pre-bucketed/
    persisted corpus layout the exchange is on the corpus's own compact
    (id, band-hash) frame, never its text."""
    if corpus_sig is None:
        if corpus_df is None:
            raise ValueError("pass corpus_df or corpus_sig")
        corpus_sig = minhash_signatures(
            corpus_df, id_col, text_col, num_hashes, shingle_size
        )
    new_sig = minhash_signatures(
        new_df, id_col, text_col, num_hashes, shingle_size
    )
    nb = _band_buckets_frame(new_sig, id_col, num_hashes, bands)
    cb = _band_buckets_frame(corpus_sig, id_col, num_hashes, bands)
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("n.sig"), F.col("c.sig"), lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(num_hashes)
    )
    vs_corpus = (
        nb.alias("n")
        .join(
            cb.alias("c"),
            (F.col("n.band") == F.col("c.band")) & (F.col("n.bh") == F.col("c.bh")),
        )
        .filter(est >= jaccard_threshold)
        .select(F.col(f"n.{id_col}").alias(id_col))
        .distinct()
    )
    survivors = new_df.join(vs_corpus, id_col, "left_anti")
    # keep-one within the remaining new batch (smaller-id neighbor rule)
    return minhash_dedup(
        survivors, id_col, text_col, num_hashes, bands, shingle_size,
        jaccard_threshold,
    )


# ---------------------------------------------------------------- SimHash
def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash: bigint) — Charikar fingerprint over word tokens.

    SHUFFLE-FREE: token hashes stay an array column and the per-bit sign
    sums are higher-order-function reductions within the row — a pure
    projection, no explode, no groupBy. (The earlier explode + 64
    conditional aggregations computed the same thing through a full
    shuffle of every token; at corpus scale this form is embarrassingly
    parallel map work.) Bit b of the fingerprint is set iff more token
    hashes have bit b set than clear: ones > n/2 ⇔ sign sum > 0."""
    hashes = F.transform(
        F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")),
        lambda t: F.xxhash64(t),
    )
    n = F.size(F.col("__hs"))
    fp = None
    for b in range(bits):
        ones = F.size(
            F.filter(
                F.col("__hs"),
                lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
            )
        )
        term = (
            F.when(ones * 2 > n, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        shifted = F.shiftleft(term, b)
        fp = shifted if fp is None else fp.bitwiseXOR(shifted)
    return df.select(F.col(id_col), hashes.alias("__hs")).select(
        F.col(id_col), fp.alias("simhash")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 64,
    blocks: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: split the fingerprint into ``blocks`` chunks; any
    pair within distance < blocks shares at least one exact chunk → join on
    (block_id, chunk) then verify exact Hamming via bit_count(xor).

    ``max_bucket_size``: same hot-bucket guard as
    ``minhash_near_dup_pairs`` — identical fingerprints pre-collapse to
    star pairs (hamming 0) against a min-id representative, and residual
    (block, chunk) buckets with more than ``max_bucket_size`` distinct
    fingerprints are dropped from candidate generation.
    """
    assert bits % blocks == 0
    width = bits // blocks
    from pyspark import StorageLevel

    # simhash() is now a pure projection (no shuffle), so the self-join
    # sides would each recompute the tokenize+hash work — persist the one
    # compact (id, fingerprint) row per doc instead.
    sh = simhash(df, id_col, text_col, bits).persist(StorageLevel.MEMORY_AND_DISK)
    star = None
    if max_bucket_size is not None:
        sh, star = _collapse_identical(sh, id_col, "simhash")
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        star = star.withColumn("hamming", F.lit(0))
    mask = (1 << width) - 1
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for i in range(blocks)
        ]
    )
    b = sh.select(id_col, "simhash", F.explode(chunk_arr).alias("c")).select(
        id_col, "simhash", F.col("c.blk").alias("blk"), F.col("c.chunk").alias("chunk")
    )
    if max_bucket_size is not None:
        b = _drop_hot_buckets(b, ["blk", "chunk"], max_bucket_size)
    pairs = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs


# ---------------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 1,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity pairs over word n-gram sets — the
    verification-grade (non-approximate) near-dup operator.

    Inverted-index self-join: explode distinct shingles, join on shingle,
    count intersections, derive |A∪B| from set sizes. The stop-shingle cap
    is mandatory at scale (see module docstring).
    """
    from pyspark import StorageLevel

    # The exploded posting list feeds BOTH sides of the self-join AND the
    # size aggregate; without materialization Spark recomputes the full
    # explode+hash+stop-shingle lineage three times (DuckDB's CTE scans
    # once). Persisting the postings is the write-once inverted index a
    # scaled system would build anyway (measured 7× on the sf0.1 corpus).
    ex = _exploded_shingles(
        df, id_col, text_col, shingle_size, max_shingle_df
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = ex.groupBy("__id").agg(F.count("*").alias("sz"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.__h") == F.col("b.__h")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ------------------------------------------------- connected components (D2)
def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id in the connected cluster — EXACT duplicate clusters, where
    the min-id-neighbor rule in ``minhash_dedup`` is a one-hop
    approximation.

    Hash-min label propagation: each round every node takes the min of its
    own label and its neighbors' labels; stops when a round changes
    nothing. Rounds = graph diameter (near-dup clusters are shallow;
    pathological chains cap at ``max_iter``). Each round is one join + one
    groupBy — all DataFrame ops, executable at any scale; the driver sees
    only a per-round change count. The large-star/small-star variant
    (Kiveris et al., "Connected Components in MapReduce") drops rounds to
    O(log n) if ever needed.

    The returned DataFrame IS the final persisted labels frame — callers
    that are done with it should ``.unpersist()`` it (session-scoped
    cache otherwise; Spark LRU-evicts under pressure).
    """
    from pyspark import StorageLevel

    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        und.select("a")
        .distinct()
        .select(F.col("a").alias("node"), F.col("a").alias("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # The most recent localCheckpoint still ROOTING live lineage: on the
    # persist()-only rounds new_labels' recompute chain runs back to this
    # frame's LogicalRDD, whose blocks are the ONLY copy (checkpointing
    # truncated the lineage above them). Releasing it before the next
    # checkpoint round would turn any lost cached partition of a
    # persist-round frame into a permanent missing-block failure instead
    # of a recompute — so a checkpointed labels is released DEFERRED, on
    # the round a newer checkpoint supersedes it as the lineage root.
    pinned_ckpt: DataFrame | None = None
    for it in range(max_iter):
        nbr_min = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy(und["a"].alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = labels.join(
            nbr_min, labels["node"] == nbr_min["node2"], "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        # Persist alone keeps the full join+groupBy lineage growing by one
        # level per round — on a long-chain graph (diameter ≫ 5) Catalyst
        # re-analysis cost and lineage depth blow up. Truncate it every few
        # rounds: localCheckpoint materializes the frame and CUTS lineage.
        ckpt_round = (it + 1) % 5 == 0
        if ckpt_round:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        if ckpt_round:
            # new_labels is self-contained: the superseded labels AND the
            # previously pinned checkpoint are no longer reachable from
            # any live lineage — release both block sets now.
            if labels is not pinned_ckpt:
                release_plan_blocks(labels)
            if pinned_ckpt is not None:
                release_plan_blocks(pinned_ckpt)
            pinned_ckpt = new_labels
        elif labels is not pinned_ckpt:
            # persist-round labels is recomputable (lineage intact down to
            # pinned_ckpt / the persisted edge list), so plain cache
            # release is safe; a checkpointed labels stays pinned.
            release_plan_blocks(labels)
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    # NOTE: if the final labels came from a persist() round, pinned_ckpt
    # still roots its recompute lineage and must outlive the returned
    # frame — it is deliberately NOT released here (GC + ContextCleaner
    # reclaim it with the result).
    return labels.select(F.col("node"), F.col("label").alias("component"))


# ------------------------------------------------- decontamination (D2)
def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥ ``min_overlap``
    distinct word ``shingle_size``-grams with ANY benchmark document
    (the standard eval-contamination screen for training corpora).

    Returns (id_col, shared_grams) for contaminated docs only.

    100 TB shape: the benchmark gram set (an eval suite — KBs to MBs) is
    tiny next to the corpus, so it is distinct-ed and **broadcast**; the
    corpus side is exploded shingles → broadcast-hash semi-ish join →
    one groupBy on the doc id. The corpus is never shuffled by gram and
    never self-joined, so there is no posting-list blowup to cap — join
    fan-out is bounded by the corpus's own gram count.
    """
    # shingle_col is array_distinct per doc, so (__id, __s) pairs are
    # already unique — no corpus-wide distinct shuffle needed.
    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.explode(shingle_col(text_col, shingle_size)).alias("__s"),
    )
    b = (
        benchmark.select(
            F.explode(shingle_col(text_col, shingle_size)).alias("__s")
        )
        .distinct()
    )
    hits = (
        c.join(F.broadcast(b), "__s")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_overlap)
    )
    return hits.select(F.col("__id").alias(id_col), "shared_grams")


def source_vocab_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """Pairwise vocabulary overlap between corpus slices: for every pair
    of groups, the number of shared distinct word ``shingle_size``-grams
    and the Jaccard of their gram sets — the cross-slice contamination /
    homogeneity diagnostic that complements ``corpus_drift``.

    Shape: one distinct per (group, gram), then an equi-self-join ON THE
    GRAM (groups-per-gram fan-out is bounded by the number of slices —
    tiny — never by corpus size), then a pair-space hash agg.
    """
    grams = df.select(
        F.col(group_col).alias("__g"),
        F.explode(shingle_col(text_col, shingle_size)).alias("__s"),
    ).distinct()
    # three consumers (sizes, both self-join sides) would each re-run
    # the shingle explode + distinct — share ONE evaluation (lazy: the
    # first action materializes the blocks, the same action reuses them)
    grams = grams.localCheckpoint(eager=False)
    sizes = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    a = grams.select(F.col("__g").alias("ga"), "__s")
    b = grams.select(F.col("__g").alias("gb"), F.col("__s").alias("__s2"))
    inter = (
        a.join(b, (F.col("__s") == F.col("__s2")) & (F.col("ga") < F.col("gb")))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("__g").alias("ga"), F.col("__n").alias("na"))
    nb = sizes.select(F.col("__g").alias("gb"), F.col("__n").alias("nb"))
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return (
        inter.join(F.broadcast(na), "ga")
        .join(F.broadcast(nb), "gb")
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "n_shared",
            (F.floor(jac * 1000000.0 + 0.5) / 1000000.0).alias("jaccard"),
        )
    )


def multi_benchmark_contamination(
    corpus: DataFrame,
    benchmarks: DataFrame,
    bench_col: str = "bench_name",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 8,
) -> DataFrame:
    """Decontamination against MANY eval suites at once, with
    attribution: for each (corpus doc, benchmark) pair that shares at
    least one distinct word ``shingle_size``-gram, the shared-gram
    count. One corpus shingle pass serves every benchmark; the combined
    (bench, gram) set is still eval-suite-sized, so it broadcasts — the
    corpus is never shuffled by gram and never self-joins, exactly like
    the single-benchmark screen.
    """
    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.explode(shingle_col(text_col, shingle_size)).alias("__s"),
    )
    b = (
        benchmarks.select(
            F.col(bench_col).alias("__b"),
            F.explode(shingle_col(text_col, shingle_size)).alias("__s"),
        )
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "__s")
        .groupBy("__id", "__b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .select(
            F.col("__id").alias(id_col),
            F.col("__b").alias(bench_col),
            "shared_grams",
        )
    )


# ------------------------------------------- exact-substring spans (D21/d14)
def duplicate_span_intervals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 50,
) -> DataFrame:
    """Token intervals covered by REPEATED spans — the detection half of
    :func:`exact_substring_dedup` (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": repeated >=N-token
    substrings are removed everywhere but their first occurrence; unlike
    whole-doc near-dup (``minhash_dedup``) or repeated-line removal
    (``drop_repeated_lines``), this catches boilerplate SPANS embedded in
    otherwise-distinct documents).

    Model: whitespace-token shingles of length ``span_tokens`` at every
    start position. A span string occurring >=2 times corpus-wide is a
    duplicate; its occurrence with the smallest ``(doc_id, pos)`` is the
    keeper, every other occurrence yields an excision interval
    ``[pos, pos + span_tokens)``. Overlapping/touching intervals are
    merged per doc (a duplicated region of length M > span_tokens shows
    up as M - span_tokens + 1 overlapping shingles — the merge collapses
    them to one interval, recovering the full repeated region).

    Scale shape (the suffix-array construction of the paper is a
    single-node build; this is the distributed equivalent):
    - shingle stream is one row per token position — linear in corpus
      tokens, generated by a pure projection + explode; the span STRING
      exists only transiently inside that projection (hashed to an
      8-byte ``xxhash64`` sig and dropped before anything shuffles);
    - duplicate detection is TWO-PHASE: phase 1 group-bys the sig and
      keeps hashes seen >=2 times — unique spans (the overwhelming
      majority of a clean corpus) never cost more than their 8-byte sig;
    - phase 2 verifies suspects by EXACT span string, but the strings
      are REBUILT from the doc token arrays (one bounded by-id join)
      only for suspect positions, and the verify aggregation groups by
      sig carrying ``min/max(span)`` + ``min(struct(doc_id, pos))`` —
      all combinable aggs, so the shuffle carries (sig, id, pos) rows
      plus at most two span strings per (sig, partition), never one
      span string per occurrence (r6 measured the occurrence-level span
      shuffle at ~span_tokens× corpus bytes on an all-dup corpus; this
      shape cuts it ~50×). ``min(span) == max(span)`` proves the sig
      maps to ONE string — the exactness guarantee — and the keeper/
      excise join then needs only the 8-byte sig; colliding sigs
      (different strings, same hash — astronomically rare, usually
      zero) fall back to the exact per-string grouping on just those
      rows, so semantics stay exactly count-by-string >= 2;
    - keeper selection is inside the same combinable aggregation — no
      per-span window, so a pathological span repeated 10^9 times costs
      one partial-aggregated pass, not a single-reducer sort;
    - interval merging is a per-``doc_id`` window (bounded by document
      length, never global).

    Returns ``(id_col, s, e)`` merged excision intervals, token-indexed,
    half-open.
    """
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    L = int(span_tokens)
    long_docs = base.filter(F.size("__toks") >= L)
    # one row per start position carrying ONLY (id, pos, sig): the span
    # string is built and hashed inside the projection, never shuffled;
    # docs shorter than L emit nothing (sequence() with a negative stop
    # would DESCEND)
    span_at = lambda i: F.array_join(F.slice("__toks", i + 1, L), " ")  # noqa: E731
    sh = long_docs.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - L),
                lambda i: F.struct(
                    i.alias("pos"), F.xxhash64(span_at(i)).alias("sig")
                ),
            )
        ).alias("__sh"),
    ).select(
        "__id", F.col("__sh.pos").alias("__pos"), F.col("__sh.sig").alias("__sig")
    )
    dup_sigs = (
        sh.groupBy("__sig").agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__sig")
    )
    suspects = sh.join(dup_sigs, "__sig", "left_semi")
    # rebuild span strings for suspect positions only: one by-id equi-join
    # against the token arrays (the corpus shuffles its tokens ONCE here,
    # vs every suspect occurrence shuffling a span_tokens-long string)
    spanned = suspects.join(long_docs, "__id").select(
        "__id", "__pos", "__sig",
        F.array_join(F.slice("__toks", F.col("__pos") + 1, L), " ").alias("__span"),
    )
    sig_stats = spanned.groupBy("__sig").agg(
        F.count(F.lit(1)).alias("__n_occ"),
        F.min("__span").alias("__mn"),
        F.max("__span").alias("__mx"),
        F.min(
            F.struct(F.col("__id").alias("i"), F.col("__pos").alias("p"))
        ).alias("__keep"),
    )
    # sig ↔ one exact string: count/keeper over the sig group ARE the
    # per-string values — excise via the slim 8-byte-sig join
    clean = sig_stats.filter(
        (F.col("__mn") == F.col("__mx")) & (F.col("__n_occ") >= 2)
    ).select("__sig", "__keep")
    excise_clean = (
        suspects.join(clean, "__sig")
        .filter(
            (F.col("__id") != F.col("__keep.i")) | (F.col("__pos") != F.col("__keep.p"))
        )
        .select("__id", F.col("__pos").alias("s"), (F.col("__pos") + L).alias("e"))
    )
    # hash-collision fallback (different strings, same sig): exact
    # per-string grouping on just the colliding rows — keeps the
    # documented count-by-string >= 2 semantics bit-for-bit
    collide_sigs = sig_stats.filter(F.col("__mn") != F.col("__mx")).select("__sig")
    collide_spanned = spanned.join(collide_sigs, "__sig", "left_semi")
    collide_groups = (
        collide_spanned.groupBy("__span")
        .agg(
            F.count(F.lit(1)).alias("__n_occ"),
            F.min(
                F.struct(F.col("__id").alias("i"), F.col("__pos").alias("p"))
            ).alias("__keep"),
        )
        .filter(F.col("__n_occ") >= 2)
        .select("__span", "__keep")
    )
    excise_collide = (
        collide_spanned.join(collide_groups, "__span")
        .filter(
            (F.col("__id") != F.col("__keep.i")) | (F.col("__pos") != F.col("__keep.p"))
        )
        .select("__id", F.col("__pos").alias("s"), (F.col("__pos") + L).alias("e"))
    )
    excise = excise_clean.unionByName(excise_collide)
    # merge overlapping/touching intervals per doc: an interval starts a
    # new group iff its s exceeds the running max end of everything before
    w = Window.partitionBy("__id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grouped = excise.withColumn(
        "__new", (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("int")
    ).withColumn(
        "__grp", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy("__id", "__grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .select(F.col("__id").alias(id_col), "s", "e")
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 50,
) -> DataFrame:
    """Remove repeated >=``span_tokens``-token substrings everywhere but
    their first occurrence (Lee et al. 2022 ExactSubstr, distributed —
    see :func:`duplicate_span_intervals` for the detection model and the
    100 TB shape). Tokens whose index falls in any excision interval are
    dropped and the document is re-joined with single spaces (the corpus
    convention; original inter-token whitespace is normalized). Returns
    ``(id_col, text_clean, n_removed)`` — every input doc keeps its row,
    fully-excised docs come back as the empty string.
    """
    iv = duplicate_span_intervals(df, id_col, text_col, span_tokens)
    per_doc = iv.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("__iv")
    )
    # null text coalesces to '' BEFORE tokenizing (as in detection) so the
    # documented contract holds: every input doc keeps its row, null/empty
    # text comes back as text_clean='' with n_removed=0 — without this,
    # sequence(0, size(null)-1) propagates nulls into both outputs
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks")).join(
        per_doc, id_col, "left"
    )
    ivs = F.coalesce(F.col("__iv"), F.array().cast("array<struct<s:int,e:int>>"))
    indexed = F.zip_with(
        F.col("__toks"),
        F.sequence(F.lit(0), F.size("__toks") - 1),
        lambda t, i: F.struct(t.alias("t"), i.alias("i")),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            ivs, lambda v: (s["i"] >= v["s"]) & (s["i"] < v["e"])
        ),
    )
    return base.select(
        id_col,
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("text_clean"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


# ---------------------------------------- bloom-prefilter decontamination


def bloom_build(
    df: DataFrame, value_col: str, m_bits: int = 1 << 18, k: int = 4
) -> DataFrame:
    """Build a Bloom filter over a value column as a ``(word int, bits
    long)`` relation — ``m_bits/64`` longs max, OR-aggregated, mergeable
    (union + bit_or), persistable. Positions are ``pmod(xxhash64(value,
    i), m_bits)`` for i in 0..k-1 — the public-spec hash chain the
    pyoracle model replays exactly, so membership decisions are
    deterministic cross-engine. A 2^18-bit filter is 32 KB: the
    broadcast-screening artifact stays ~100× smaller than broadcasting
    the distinct value set itself."""
    pos = F.array(
        *[
            F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )
    ex = df.select(F.explode(pos).alias("__p"))
    return (
        ex.select(
            F.shiftright("__p", 6).cast("int").alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pmod(__p, 64) as int))"
            ).alias("__mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def _bloom_screen(
    df: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Keep only rows whose value MAY be in the bloom (all k bits set) —
    k broadcast-hash joins against the tiny word relation, no shuffle of
    ``df``. No false negatives, so downstream exact logic sees every
    true match; false positives only add rows the exact join drops."""
    out = df
    cond = None
    for i in range(k):
        p = F.pmod(F.xxhash64(F.col(value_col), F.lit(i)), F.lit(m_bits))
        out = out.withColumn(f"__p{i}", p)
        bl = bloom.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = out.withColumn(
            f"__w{i}", F.shiftright(F.col(f"__p{i}"), 6).cast("int")
        ).join(F.broadcast(bl), f"__w{i}", "left")
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), cast(pmod(__p{i}, 64) as int))"
        )
        hit = F.coalesce(F.col(f"__b{i}"), F.lit(0).cast("long")).bitwiseAND(
            mask
        ) != 0
        cond = hit if cond is None else (cond & hit)
    drop = [c for i in range(k) for c in (f"__p{i}", f"__w{i}", f"__b{i}")]
    return out.filter(cond).drop(*drop)


def ngram_contamination_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 8,
    min_overlap: int = 1,
    m_bits: int = 1 << 18,
    k: int = 4,
) -> DataFrame:
    """:func:`ngram_contamination` with a Bloom screening pass — the
    100 TB shape when the benchmark gram set itself is too big to be the
    FIRST thing every corpus gram probes: build a 32 KB-scale bloom over
    the benchmark grams, screen the exploded corpus grams with k
    broadcast int-joins (no strings move), and only the surviving grams
    — true matches plus the ~(1-e^{-kn/m})^k false-positive sliver — pay
    the exact string equi-join. No false negatives, so the result is
    IDENTICAL to the plain operator (d26 oracles against d07's exact
    SQL; equality also unit-tested)."""
    b_grams = (
        benchmark.select(
            F.explode(shingle_col(text_col, shingle_size)).alias("__s")
        )
        .distinct()
    )
    bloom = bloom_build(b_grams, "__s", m_bits, k)
    c = corpus.select(
        F.col(id_col).alias("__id"),
        F.explode(shingle_col(text_col, shingle_size)).alias("__s"),
    )
    survivors = _bloom_screen(c, "__s", bloom, m_bits, k)
    hits = (
        survivors.join(F.broadcast(b_grams), "__s")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_overlap)
    )
    return hits.select(F.col("__id").alias(id_col), "shared_grams")


def _pair_shingles(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """Shared prep for the pairwise truth operators: the slim pair
    relation and the pair-bounded shingle explosion, each PERSISTED so
    one evaluation feeds every consumer (r14: the pair relation is read
    4× — both id unions, the intersection probe, the final left join —
    and for an upstream like ``minhash_near_dup_pairs`` each read
    re-ran the banded self-join + candidate dedup; the shingle relation
    is read 3× — both intersection sides and the size agg — and each
    read re-ran the semi-join + interpreted shingle split). Both frames
    are pair-population-bounded, so caching them is metadata-sized
    relative to the corpus. Returns ``(p, sh, cached)``; the caller
    must thread ``cached`` (which extends the upstream's
    ``_bds_cached`` handle) onto its result for
    ``release_signature_caches``."""
    from pyspark import StorageLevel

    cached = list(getattr(pairs, "_bds_cached", []))
    p = pairs.select("id_a", "id_b").persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(p)
    ids = (
        p.select(F.col("id_a").alias("__id"))
        .unionAll(p.select(F.col("id_b").alias("__id")))
        .distinct()
    )
    docs = df.join(
        ids, df[id_col] == ids["__id"], "left_semi"
    ).select(F.col(id_col).alias("__d"), F.col(text_col))
    sh = docs.select(
        "__d", F.explode(shingle_col(text_col, shingle_size)).alias("__s")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(sh)
    return p, sh, cached


def pairwise_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    jaccard_round: int = 6,
) -> DataFrame:
    """EXACT word-shingle Jaccard for a GIVEN pair relation
    ``(id_a, id_b)`` — the verification half of LSH calibration: the
    banded MinHash estimate SELECTED the candidates, this computes the
    truth on exactly those pairs, so threshold tuning reads estimate-
    vs-truth on real data instead of trusting the banding math.
    Returns ``(id_a, id_b, exact_jaccard)`` (floor-scaled at
    10^-``jaccard_round``; pairs with no shared shingle report 0.0,
    pairs where either side has no shingles report NULL).

    Scale shape: docs are SEMI-joined to the pair relation first, so
    shingle explosion is pair-population-bounded, never corpus-wide;
    the intersection is two equi-joins of the pair relation against
    the exploded shingles + one per-pair hash agg — no all-pairs
    join, no inverted-index self-join, no stop-shingle cap needed
    (the pair set already bounds the work)."""
    p, sh, cached = _pair_shingles(df, pairs, id_col, text_col, shingle_size)
    sizes = sh.groupBy("__d").agg(F.count(F.lit(1)).alias("__sz"))
    inter = (
        p.join(
            sh.select(F.col("__d").alias("id_a"), F.col("__s")), "id_a"
        )
        .join(
            sh.select(F.col("__d").alias("id_b"), F.col("__s")),
            ["id_b", "__s"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__ni"))
    )
    scale = float(10 ** jaccard_round)
    out = (
        p.join(inter, ["id_a", "id_b"], "left")
        .join(
            sizes.select(F.col("__d").alias("id_a"), F.col("__sz").alias("__sa")),
            "id_a",
            "left",
        )
        .join(
            sizes.select(F.col("__d").alias("id_b"), F.col("__sz").alias("__sb")),
            "id_b",
            "left",
        )
        .select(
            "id_a",
            "id_b",
            F.when(
                F.col("__sa").isNotNull() & F.col("__sb").isNotNull(),
                F.floor(
                    F.coalesce(F.col("__ni"), F.lit(0)).cast("double")
                    / (
                        F.col("__sa") + F.col("__sb")
                        - F.coalesce(F.col("__ni"), F.lit(0))
                    ).cast("double")
                    * scale
                    + 0.5
                )
                / scale,
            ).alias("exact_jaccard"),
        )
    )
    out._bds_cached = cached  # type: ignore[attr-defined]
    return out


def pairwise_containment(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    score_round: int = 6,
) -> DataFrame:
    """EXACT word-shingle CONTAINMENT for a GIVEN pair relation
    ``(id_a, id_b)`` — the asymmetric companion to
    :func:`pairwise_jaccard` (Broder 1997 distinguishes resemblance
    from containment): ``containment(A in B) = |A ∩ B| / |A|``. A short
    doc quoted wholesale inside a long one scores near 1.0 containment
    while its symmetric Jaccard stays low (the union is dominated by
    the long side) — exactly the boilerplate-wrapper / quote-inclusion
    duplicates a Jaccard-thresholded dedup ships to training. Returns
    ``(id_a, id_b, n_shared, containment_a_in_b, containment_b_in_a,
    max_containment)``; sides with no shingles report NULL scores.

    Scale shape: identical to ``pairwise_jaccard`` — docs SEMI-joined
    to the pair relation before any shingle explosion (pair-population-
    bounded, never corpus-wide), two equi-joins + one per-pair hash
    agg, no all-pairs work."""
    p, sh, cached = _pair_shingles(df, pairs, id_col, text_col, shingle_size)
    sizes = sh.groupBy("__d").agg(F.count(F.lit(1)).alias("__sz"))
    inter = (
        p.join(
            sh.select(F.col("__d").alias("id_a"), F.col("__s")), "id_a"
        )
        .join(
            sh.select(F.col("__d").alias("id_b"), F.col("__s")),
            ["id_b", "__s"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("__ni"))
    )
    scale = float(10 ** score_round)
    ni = F.coalesce(F.col("__ni"), F.lit(0).cast("long"))
    frac = lambda d: F.when(
        d.isNotNull(),
        F.floor(ni.cast("double") / d.cast("double") * scale + 0.5) / scale,
    )
    out = (
        p.join(inter, ["id_a", "id_b"], "left")
        .join(
            sizes.select(F.col("__d").alias("id_a"), F.col("__sz").alias("__sa")),
            "id_a",
            "left",
        )
        .join(
            sizes.select(F.col("__d").alias("id_b"), F.col("__sz").alias("__sb")),
            "id_b",
            "left",
        )
        .select(
            "id_a",
            "id_b",
            ni.alias("n_shared"),
            frac(F.col("__sa")).alias("containment_a_in_b"),
            frac(F.col("__sb")).alias("containment_b_in_a"),
            F.greatest(
                frac(F.col("__sa")), frac(F.col("__sb"))
            ).alias("max_containment"),
        )
    )
    out._bds_cached = cached  # type: ignore[attr-defined]
    return out


def source_overlap_matrix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    num_hashes: int = 64,
    shingle_size: int = 3,
    out_round: int = 6,
) -> DataFrame:
    """Corpus-level overlap matrix: for every pair of sources, the
    MinHash-estimated Jaccard similarity of their UNION shingle sets —
    "how much of crawl B is already in crawl A" answered from
    constant-size sketches, before paying per-document dedup on the
    pair. Output one row per unordered source pair (``source_a <
    source_b``): ``n_eq`` (signature positions agreeing, the estimate's
    exact integer numerator) and ``est_jaccard = n_eq / num_hashes``
    (floor-scaled to ``out_round``).

    Scale shape — the per-source sketch is MERGEABLE: min over a union
    of shingle sets equals the min over all the source's shingle rows,
    so the fold is explode → ONE hash agg with ``num_hashes``
    codegen'd ``min(xxhash64(i, h))`` expressions. The shuffle carries
    only per-task partial minima (tasks × sources × num_hashes longs —
    the shingle rows themselves never shuffle), and state per source
    is ``num_hashes`` longs regardless of corpus size — the same
    min-merge property makes the sketch streamable and unionable
    across partial corpora. (The per-doc ``minhash_signatures`` array
    form composes the same sketch via element-wise min of per-doc
    signatures — the equivalence the merge-property test pins — but
    its ``zip_with`` fold is an interpreted HOF: measured 3.4× slower
    than the codegen'd agg at sf0.1.) The folded sketch relation is
    BOUNDED
    (sources × num_hashes longs — source is metadata cardinality,
    never corpus cardinality), so it is collected ONCE (the same
    bounded-collect contract as k-means' k×dim centroids) and both
    sides of the pair self-join are rebuilt as a JVM LocalRelation —
    the corpus is scanned exactly once; a lazy self-join on the raw
    lineage would recompute the signature fold per side (measured 2×
    the corpus cost at sf0.1). The pair join broadcasts one literal
    side. Documents with NULL text (no shingles) or a NULL
    ``group_col`` contribute nothing.

    Same hash chain as every MinHash op here (``xxhash64(i,
    xxhash64(shingle))``, signed-min), so estimates are comparable
    with d02's per-document thresholds and verifiable against the
    independent public-spec XXH64 model in ``queries/pyoracle.py``.
    """
    sketch = source_minhash_sketch(
        df,
        text_col=text_col,
        group_col=group_col,
        num_hashes=num_hashes,
        shingle_size=shingle_size,
    )
    return overlap_matrix_from_sketch(
        sketch, group_col=group_col, num_hashes=num_hashes,
        out_round=out_round,
    )


def source_minhash_sketch(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """The mergeable per-source MinHash sketch behind D82, in LONG
    ``(group_col, pos, min_val)`` format — the persistable/streamable
    state: two partial sketches over disjoint corpus slices combine by
    per-(source, pos) ``least`` (min over a union of shingle sets is
    the min of the parts' mins), which is exactly the c36 streaming
    merge. One explode + one hash agg with ``num_hashes`` codegen'd
    ``min(xxhash64(i, h))`` expressions; the shuffle carries only
    per-task partial minima."""
    ex = (
        df.filter(
            F.col(group_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .select(
            F.col(group_col),
            F.explode(shingle_col(text_col, shingle_size)).alias("__sh"),
        )
        .select(F.col(group_col), F.xxhash64("__sh").alias("__h"))
    )
    folded = ex.groupBy(group_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return folded.select(
        F.col(group_col),
        F.posexplode(
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
        ).alias("pos", "min_val"),
    )


def overlap_matrix_from_sketch(
    sketch: DataFrame,
    group_col: str = "source",
    num_hashes: int = 64,
    out_round: int = 6,
) -> DataFrame:
    """The pair-matrix phase of D82 over a ``(group_col, pos,
    min_val)`` sketch relation — one-shot or maintained by the c36
    streaming merge. The sketch is BOUNDED (sources × num_hashes
    longs — metadata cardinality), so it is collected once (the
    k-means k×dim contract) and both sides of the quadratic self-join
    are rebuilt as a JVM LocalRelation; a lazy self-join on corpus
    lineage would recompute the fold per side (measured 2× the corpus
    cost at sf0.1)."""
    from basis_devkit_spark.session import local_relation

    scale = float(10 ** out_round)
    spark = sketch.sparkSession
    gtype = sketch.schema[group_col].dataType.simpleString()
    sketch_rows = [
        (r[group_col], r["pos"], r["min_val"]) for r in sketch.collect()
    ]
    local = local_relation(
        spark,
        sketch_rows,
        f"`{group_col}` {gtype}, __pos int, __mv long",
    )
    a = local.select(
        F.col(group_col).alias("source_a"),
        F.col("__pos"),
        F.col("__mv").alias("__va"),
    )
    b = local.select(
        F.col(group_col).alias("source_b"),
        F.col("__pos"),
        F.col("__mv").alias("__vb"),
    )
    pairs = a.join(
        F.broadcast(b),
        (a["__pos"] == b["__pos"]) & (a["source_a"] < b["source_b"]),
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.sum(
                (F.col("__va") == F.col("__vb")).cast("long")
            ).alias("n_eq")
        )
        .select(
            "source_a",
            "source_b",
            "n_eq",
            (
                F.floor(
                    F.col("n_eq")
                    / F.lit(float(num_hashes))
                    * scale
                    + F.lit(0.5)
                )
                / scale
            ).alias("est_jaccard"),
        )
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    min_shared: int = 2,
    max_rel_edit: float = 0.2,
    min_sentence_chars: int = 20,
) -> DataFrame:
    """Fuzzy benchmark decontamination: exact n-gram screens (D7/D37)
    miss eval items that leaked with small edits — re-worded numbers,
    punctuation drift, template fills. This verb confirms candidate
    leaks at SENTENCE granularity with an edit-distance gate: corpus
    and benchmark docs split into normalized sentences (lowercase,
    whitespace-collapsed, ≥ ``min_sentence_chars``), sentence pairs
    sharing ≥ ``min_shared`` distinct word ``shingle_size``-grams are
    candidates, and a candidate is a LEAK when
    ``levenshtein(cs, bs) ≤ floor(max_rel_edit · max(len(cs),
    len(bs)))``. Returns one row per contaminated (corpus doc,
    benchmark doc): ``n_fuzzy_sentences`` and ``min_edit``.

    100 TB shape — the D7 argument, sharpened: the benchmark gram
    relation (an eval suite) is distinct-ed and BROADCAST; the corpus
    side dedups to DISTINCT sentence strings before anything
    quadratic (boilerplate corpora repeat a sentence across thousands
    of docs — scoring per doc pair would re-run the O(len²)
    levenshtein once per repetition; measured 60× the wall on the
    templated sf0.1 corpus), and doc attribution joins back only the
    confirmed leak strings; the levenshtein runs ONLY on distinct
    candidate pairs that already share ``min_shared`` grams (gram
    screen = recall filter, edit gate = precision filter — never
    corpus × benchmark). Exact-integer edit distances and counts; no
    floats beyond the one rel-edit bound.
    """
    def sentences(df: DataFrame, idname: str, sname: str) -> DataFrame:
        raw = df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias(idname),
            F.explode(
                F.split(F.col(text_col), r"[.!?]+")
            ).alias("__raw"),
        )
        norm = F.trim(
            F.regexp_replace(F.lower(F.col("__raw")), r"\s+", " ")
        )
        return raw.select(
            F.col(idname), norm.alias(sname)
        ).filter(F.length(sname) >= int(min_sentence_chars)).distinct()

    def grams(df: DataFrame, sname: str, *extra: str) -> DataFrame:
        return df.select(
            *extra,
            sname,
            F.explode(shingle_col(sname, shingle_size)).alias("__g"),
        )

    cs = sentences(corpus, "__cid", "__cs")
    bs = sentences(benchmark, "__bid", "__bs")
    # candidates + edit distances at the DISTINCT sentence-pair level:
    # boilerplate-heavy corpora repeat the same sentence across many
    # docs, and scoring per (doc, bench-doc) pair would re-run the
    # O(len²) levenshtein once per repetition (measured 60× the wall on
    # the templated sf0.1 corpus). Text dedups first; doc attribution
    # joins back after the gate, touching only confirmed leak strings.
    csd = cs.select("__cs").distinct()
    bsd = bs.select("__bid", "__bs").distinct()
    cand = (
        grams(csd, "__cs")
        .join(F.broadcast(grams(bsd, "__bs", "__bid")), "__g")
        .groupBy("__cs", "__bid", "__bs")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(F.col("__shared") >= int(min_shared))
    )
    lev = F.levenshtein(F.col("__cs"), F.col("__bs"))
    bound = F.floor(
        F.lit(float(max_rel_edit))
        * F.greatest(F.length("__cs"), F.length("__bs"))
    )
    # levenshtein ≥ |len(a) − len(b)| always, so the length gate drops
    # only pairs the edit gate would drop — a free O(1) pre-filter that
    # Catalyst is WELCOME to push into the gram join. The edit gate
    # itself must NOT move: its predicate references only group keys,
    # so the optimizer would push the O(len²) levenshtein below the
    # shared-gram aggregate into the gram-join condition — evaluating
    # it once per gram MATCH instead of once per candidate (13× the
    # evaluations at sf0.1) on the pre-shuffle task. The never-true
    # nondeterministic disjunct pins the filter after the explicit
    # repartition, where the CPU-bound distance runs wide (AQE's
    # byte-based coalescing would otherwise serialize it; measured
    # 326 s → ~13 s at sf0.1 for the two fixes together).
    pre = cand.withColumn("__bound", bound).filter(
        F.abs(F.length("__cs") - F.length("__bs")) <= F.col("__bound")
    )
    npart = corpus.sparkSession.sparkContext.defaultParallelism
    hits = pre.repartition(npart).select(
        "__cs", "__bid", lev.alias("__lev"), F.col("__bound")
    ).filter(
        (F.col("__lev") <= F.col("__bound"))
        | (F.spark_partition_id() < F.lit(0))
    )
    attributed = hits.join(cs, "__cs")
    # n_fuzzy_sentences counts DISTINCT leaked corpus sentences per
    # (doc, benchmark doc) — a corpus sentence matching 3 sentences of
    # one benchmark doc is ONE leaked sentence, not three (the
    # per-(cs,bs)-pair count the r13 version reported); min_edit stays
    # the minimum over all confirmed pairs.
    return attributed.groupBy(
        F.col("__cid").alias(id_col),
        F.col("__bid").alias("bench_id"),
    ).agg(
        F.countDistinct("__cs").cast("long").alias("n_fuzzy_sentences"),
        F.min("__lev").cast("long").alias("min_edit"),
    )
