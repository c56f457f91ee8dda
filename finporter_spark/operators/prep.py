"""Training-data preparation operators: chunking, decontamination,
deterministic sampling, and pattern redaction.

These close the gap between "a clean corpus exists" and "batches are
ready to tokenize": split documents to context-window-sized pieces,
remove documents that overlap a held-out evaluation set, draw
reproducible stratified subsets, and scrub identifier patterns. All four
are pure DataFrame compositions — map-only where possible, one keyed
shuffle where semantics require it — so they inherit Catalyst pushdown
and whole-stage codegen and hold their shape at corpus scale.

Cross-engine determinism notes (the catalog oracles depend on these):
- sampling buckets come from ``md5`` of the key's decimal string — both
  Spark and DuckDB produce identical md5 hex, unlike their (different)
  native ``hash``/``xxhash64`` builtins;
- decontamination joins on the n-gram *string*; a production pipeline
  would join on an 8-byte hash of it (same plan shape, smaller
  exchange) — the string form is kept here so the semi-join is exactly
  reproducible in the oracle engine.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from finporter_spark.operators.dedup import shingles


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 200,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    ``overlap`` characters of context carried between neighbors.

    Output: (id, chunk_id, chunk_text, chunk_chars) — one row per chunk,
    ``chunk_id`` 0-based in document order. Map-only: the chunk starts
    are a generated arithmetic sequence (``F.sequence``), exploded and
    sliced with ``substring`` — no shuffle, no UDF, and the explode
    fan-out is bounded by len/stride per row so input splits stay
    balanced. Empty documents yield one empty chunk (the row is kept:
    losing documents silently would corrupt downstream joins).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(F.col(text_col)), F.lit(1)),
        F.lit(stride),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_id", "_start"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_id",
        F.substring(F.col(text_col), F.col("_start"), chunk_chars).alias(
            "chunk_text"
        ),
        F.length(
            F.substring(F.col(text_col), F.col("_start"), chunk_chars)
        ).alias("chunk_chars"),
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 5,
) -> DataFrame:
    """Drop training documents that share ANY word ``ngram_n``-gram with
    a held-out benchmark set (eval-set contamination removal).

    Shape: explode distinct n-grams on both sides, ``left_anti`` join the
    training grams against the benchmark grams, keep documents none of
    whose grams survived on the contaminated side — expressed as an
    anti-join of doc ids against the ids of contaminated docs. Work is
    proportional to (corpus grams + benchmark grams); the benchmark side
    is typically small enough that Spark broadcasts it, making the gram
    probe map-only. Tokenization reuses :func:`~.dedup.shingles` so the
    overlap definition matches the near-dup operators'.
    """
    grams = lambda d: d.select(  # noqa: E731
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(F.col(text_col), ngram_n))
        ).alias("gram"),
    )
    bench_grams = grams(benchmark).select("gram").distinct()
    contaminated = (
        grams(df)
        .join(bench_grams, "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(contaminated, id_col, "left_anti")


def fuzzy_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    est_jaccard_threshold: float = 0.5,
    signatures: DataFrame | None = None,
    bench_signatures: DataFrame | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-dup-AWARE eval decontamination: drop a training document when
    its MinHash signature agrees with some benchmark document's on
    ``est_jaccard_threshold`` of components (estimated Jaccard).

    :func:`decontaminate` is the exact-overlap gate (shared n-gram ⇒
    contaminated); this is its fuzzy sibling for the real-world case —
    benchmark text lightly paraphrased/reformatted inside a training
    page, which exact n-gram probes miss. Candidates come from LSH band
    collisions (equi-join on (band, bucket), train side shuffled, bench
    side broadcast-sized by contract), NEVER an all-pairs scan, so the
    shape is the same one-signature-pass + bucket-join as the L2 dedup
    family; pass persisted ``signatures`` /``bench_signatures`` (see
    ``dedup.load_or_build_signatures``) to skip even that.

    MinHash estimation is probabilistic — recall vs the exact-Jaccard
    ground truth is threshold-tested in pytest regardless of family.
    With ``hash_family="md5"`` the signatures (and hence the exact drop
    set) are additionally reproducible in DuckDB SQL, so the catalog
    query carries a full value-hash oracle (the a19 pattern).
    """
    from finporter_spark.operators.dedup import band_hash, minhash_signatures

    rows_per_band = num_hashes // bands

    def prep(frame, sig, side):
        s = (
            sig
            if sig is not None
            else minhash_signatures(
                frame, text_col, id_col, shingle_n, num_hashes, hash_family
            )
        )
        return s.select(
            F.col(id_col).alias(f"{side}_id"),
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias(
                f"{side}_sig"
            ),
            F.posexplode(
                F.array(
                    *[
                        band_hash(b, rows_per_band, hash_family)
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )

    t = prep(df, signatures, "t")
    b = prep(benchmark, bench_signatures, "b")
    n_eq = F.size(
        F.filter(
            F.zip_with("t_sig", "b_sig", lambda x, y: x == y), lambda z: z
        )
    )
    contaminated = (
        t.join(F.broadcast(b), ["band", "bucket"])
        .dropDuplicates(["t_id", "b_id"])
        .filter(n_eq / F.lit(float(num_hashes)) >= est_jaccard_threshold)
        .select(F.col("t_id").alias(id_col))
        .distinct()
    )
    return df.join(contaminated, id_col, "left_anti")


def sample_u(key) -> "Column":
    """Deterministic uniform draw in [0, 1) from the md5 of a key —
    the engine-portable sibling of :func:`sample_bucket` (same hex
    prefix and width, divided instead of moduloed). Single-sources the
    convention for weighted draws (o18's Efraimidis-Spirakis race)."""
    from pyspark.sql import functions as F

    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("double")
        / 4294967296.0
    )


def sample_bucket(key: Column, buckets: int = 10000) -> Column:
    """Deterministic, engine-portable bucket in [0, buckets) for a key:
    first 8 hex chars of ``md5(key as string)``. Reruns, retries, and
    other engines (the DuckDB oracle) place every row identically —
    which ``rand()`` and engine-native hashes do not guarantee."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    strata_col: str,
    default_fraction: float = 0.0,
    buckets: int = 10000,
) -> DataFrame:
    """Reproducible per-stratum subsample: keep a row iff its md5 bucket
    falls under its stratum's fraction. Map-only (a filter — no shuffle,
    no state), so it runs at corpus scale as a scan; and because the
    bucket depends only on the key, samples are stable across runs and
    composable (a 0.5 sample contains every 0.25 sample)."""
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        t = F.when(cond, F.lit(int(frac * buckets)))
        thr = t if thr is None else thr.when(cond, F.lit(int(frac * buckets)))
    thr = (
        thr.otherwise(F.lit(int(default_fraction * buckets)))
        if thr is not None
        else F.lit(int(default_fraction * buckets))
    )
    return df.filter(sample_bucket(F.col(key_col), buckets) < thr)


def redact(
    df: DataFrame,
    col: str,
    patterns: Sequence[str | tuple[str, str]],
    replacement: str = "[REDACTED]",
    out_col: str | None = None,
    count_col: str = "n_redactions",
) -> DataFrame:
    """Scrub every match of ``patterns`` (applied in order) from ``col``
    and count how many redactions were made per row. Each pattern is a
    regex string (replaced with ``replacement``) or an explicit
    ``(regex, replacement)`` pair.

    Map-only regex work inside codegen (``regexp_replace`` /
    ``regexp_count`` — no UDF). Patterns must stay within the common
    Java/RE2 subset (no backreferences/lookaround) so the behavior is
    portable across engines; counting happens on the ORIGINAL text per
    pattern, then text is rewritten in sequence.
    """
    out_col = out_col or col
    n = F.lit(0)
    red = F.col(col)
    for p in patterns:
        pat, repl = p if isinstance(p, tuple) else (p, replacement)
        n = n + F.regexp_count(F.col(col), F.lit(pat))
        red = F.regexp_replace(red, pat, repl)
    # drop any pre-existing out_col/count_col too — the select re-appends
    # them, and keeping the originals would yield ambiguous duplicates
    drop = {out_col, count_col} | ({col} if out_col == col else set())
    keep = [c for c in df.columns if c not in drop]
    return df.select(
        *keep, red.alias(out_col), n.cast("bigint").alias(count_col)
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText rule
    family: docs dominated by repeated n-grams are boilerplate or
    degenerate generations and get filtered before training).

    Output per doc: ``n_ngrams`` (total word n-grams), ``dup_frac``
    (fraction of n-gram OCCURRENCES whose n-gram appears more than
    once) and ``top_frac`` (fraction taken by the single most frequent
    n-gram). Docs shorter than ``ngram_n`` words emit 0 counts and 0.0
    fractions — short docs are length-filtered elsewhere, not here.

    Shape: explode n-grams -> count per (doc, gram) -> re-aggregate per
    doc. Two shuffles both keyed on the doc (the second input is
    already ~distinct grams), map-side combined, fully codegen — the
    same scaling envelope as minhash_signatures.
    """
    ex = df.select(
        F.col(id_col),
        F.explode_outer(shingles(F.col(text_col), ngram_n)).alias("g"),
    )
    per_gram = ex.groupBy(id_col, "g").agg(F.count("g").alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            / F.when(F.sum("c") > 0, F.sum("c")),
            F.lit(0.0),
        ).alias("dup_frac"),
        F.coalesce(
            F.max("c") / F.when(F.sum("c") > 0, F.sum("c")), F.lit(0.0)
        ).alias("top_frac"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_tokens: int = 512,
    shards: int = 64,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (in id order)
    and cut the token stream every ``seq_tokens`` — documents span
    sequence boundaries, no padding waste. The output maps each doc to
    the sequences it lands in: (shard, seq_id, doc_id, doc_tok_start,
    n_toks), from which a loader can assemble every packed sequence.

    Scale shape: a GLOBAL concatenation order would serialize on one
    unbounded window, so the corpus is sharded by a hash of the id
    (``shards`` independent streams — exactly how a multi-worker loader
    shards anyway) and the running token offset is a window cumsum
    PARTITIONED by shard: ``shards``-way parallel, one shuffle. The
    boundary-crossing explode is ``F.sequence`` over the chunk range —
    no UDF anywhere.

    Deterministic given (corpus, seq_tokens, shards): whitespace token
    counts, md5-derived shard (cross-engine reproducible, see module
    docstring), id-ordered cumsum.
    """
    from finporter_spark.operators.text import token_count

    n_tok = token_count(F.col(text_col), mode="ws")
    w = Window.partitionBy("shard").orderBy(id_col)
    staged = (
        df.select(
            F.col(id_col),
            sample_bucket(F.col(id_col), shards).alias("shard"),
            n_tok.alias("n_toks_doc"),
        )
        .withColumn(
            "tok_off",
            F.coalesce(
                F.sum("n_toks_doc").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    first = F.floor(F.col("tok_off") / seq_tokens)
    last = F.floor(
        (F.col("tok_off") + F.greatest(F.col("n_toks_doc"), F.lit(1)) - 1)
        / seq_tokens
    )
    return staged.select(
        "shard",
        F.col(id_col),
        "tok_off",
        "n_toks_doc",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    ).select(
        "shard",
        F.col("seq_id").cast("long"),
        F.col(id_col),
        F.greatest(
            F.col("seq_id") * seq_tokens - F.col("tok_off"), F.lit(0)
        ).cast("long").alias("doc_tok_start"),
        (
            F.least(
                (F.col("seq_id") + 1) * seq_tokens - F.col("tok_off"),
                F.col("n_toks_doc"),
            )
            - F.greatest(
                F.col("seq_id") * seq_tokens - F.col("tok_off"), F.lit(0)
            )
        ).cast("long").alias("n_toks"),
    )


def span_dedup_stats(
    df: DataFrame,
    ngram_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_threshold: float = 0.5,
) -> DataFrame:
    """Repeated-span statistics + keep decision — the C4/CCNet-style
    "remove documents dominated by text seen earlier in the corpus"
    gate, at word ``ngram_n``-gram granularity.

    A span is duplicated when the same n-gram first appears in a
    lower-``id_col`` document (corpus order = dedup priority, the same
    keep-min-id convention as l2/l11/l22). A document is kept while
    ``dup_frac < drop_threshold``.

    Plan: explode spans (positions 0..len-n) keyed by the span's md5
    digest BYTES (``unhex(md5)``: fixed 16-byte binary keys through the
    shuffle — half the hex-string width, a fraction of the raw grams);
    each span's first document is a ``min() OVER (PARTITION BY key)``
    window — ONE materialization of the gram table and TWO keyed
    shuffles total (gram, doc), vs the groupBy+join-back formulation
    that recomputes the corpus-sized explode for the join side. No
    driver state. Documents shorter than ``ngram_n`` tokens have no
    spans and are absent from the output (same as the oracle).

    Scale note (round-9 re-measure): this shape is LINEAR at the
    sf1→10 decade — 16.0 → 82.0 s (5.1×); the 10.9× ratio recorded in
    round 8 was load noise, not gram skew. The l32 set-compression
    alternative (distinct (doc, gram) + combiner min + join-back) was
    built and measured WORSE on this corpus — 20.3 → 153.6 s — because
    grams are almost all unique within a document, so the compression
    shrinks nothing and its extra composite-key shuffle is pure cost.
    Revisit only for corpora with heavy within-document repetition.
    """
    from finporter_spark.operators.text import tokens

    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") >= ngram_n)
    grams = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - ngram_n),
                lambda i: F.unhex(
                    F.md5(
                        F.concat_ws(" ", F.slice("_toks", i + 1, ngram_n))
                    )
                ),
            )
        ).alias("_gkey"),
    )
    first_doc = F.min(id_col).over(Window.partitionBy("_gkey"))
    return (
        grams.withColumn("_first_doc", first_doc)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(
                (F.col("_first_doc") < F.col(id_col)).cast("long")
            ).cast("bigint").alias("n_dup"),
        )
        .withColumn(
            "dup_frac", (F.col("n_dup") / F.col("n_spans")).cast("double")
        )
        .withColumn("keep", F.col("dup_frac") < F.lit(drop_threshold))
    )


def repeated_span_coverage(
    df: DataFrame,
    ngram_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_threshold: float = 0.5,
) -> DataFrame:
    """ARBITRARY-LENGTH repeated-span dedup — the exact-substring
    shape of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"): measure, per document, how many of its
    tokens are covered by SOME repeated span of ≥ ``ngram_n`` tokens
    that first appeared in a lower-``id_col`` document, and drop the
    document when the merged coverage reaches ``drop_threshold``.

    Why this differs from :func:`span_dedup_stats` (l25): l25 counts
    duplicated fixed-width anchors as a FRACTION OF ANCHORS — a
    20-token doc with an 11-token plagiarized span has 4 of 13
    anchors duplicated (0.31, kept) while 55% of its TOKENS are
    copied. Here the anchors are only the DETECTOR: any maximal
    repeated span of length L ≥ n appears as exactly L−n+1
    consecutive duplicated anchors, and the per-document interval
    UNION of the anchor windows [i, i+n−1] (the w15 sweep-line
    algebra — equal-width intervals sorted by start merge whenever
    the next start ≤ previous start + n) recovers each span's TRUE
    token length, without a distributed suffix array.

    Output per document with ≥ n tokens: ``n_tokens``,
    ``covered_tokens`` (merged-union size), ``n_spans`` (merged
    maximal spans), ``max_span`` (longest one), ``coverage``, and
    ``keep`` = coverage < drop_threshold. Zero-duplication documents
    appear with coverage 0 (the left join back to the token table).

    Plan/scale: the l25 shape plus one per-document window — explode
    positional anchors (16-byte md5 keys), one gram-keyed window for
    first-doc, then the merge is TWO windows + a groupBy all
    partitioned by doc_id (per-task state = one document's duplicated
    anchors, never the corpus) and one doc-keyed left join. Linear in
    corpus tokens; no driver state."""
    from finporter_spark.operators.text import tokens

    n = ngram_n
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") >= n)
    docs = toks.select(id_col, F.size("_toks").alias("n_tokens"))
    grams = toks.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.unhex(
                    F.md5(F.concat_ws(" ", F.slice("_toks", i + 1, n)))
                ),
            )
        ).alias("_i", "_gkey"),
    )
    first_doc = F.min(id_col).over(Window.partitionBy("_gkey"))
    dup = (
        grams.withColumn("_fd", first_doc)
        .filter(F.col("_fd") < F.col(id_col))
        .select(id_col, "_i")
    )
    wp = Window.partitionBy(id_col).orderBy("_i")
    # equal-width intervals sorted by start: a new merged span starts
    # exactly when this anchor no longer overlaps/touches the previous
    # one (start gap > n); -9 sentinel < any i - n, so row 1 opens one
    newg = F.when(
        F.col("_i") > F.coalesce(F.lag("_i").over(wp), F.lit(-9)) + n, 1
    ).otherwise(0)
    grp = dup.withColumn("_new", newg).withColumn(
        "_grp", F.sum("_new").over(wp)
    )
    spans = grp.groupBy(id_col, "_grp").agg(
        (F.max("_i") - F.min("_i") + n).alias("_slen")
    )
    agg = spans.groupBy(id_col).agg(
        F.sum("_slen").cast("bigint").alias("covered_tokens"),
        F.count("*").cast("bigint").alias("n_spans"),
        F.max("_slen").cast("bigint").alias("max_span"),
    )
    cov = F.coalesce(F.col("covered_tokens"), F.lit(0)).cast(
        "double"
    ) / F.col("n_tokens")
    return docs.join(agg, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("covered_tokens"), F.lit(0))
        .cast("bigint")
        .alias("covered_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0))
        .cast("bigint")
        .alias("n_spans"),
        F.coalesce(F.col("max_span"), F.lit(0))
        .cast("bigint")
        .alias("max_span"),
        cov.alias("coverage"),
        (cov < F.lit(float(drop_threshold))).alias("keep"),
    )


def three_way_split(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    val_slot: int = 1,
    test_slot: int = 2,
    slots: int = 20,
) -> DataFrame:
    """Deterministic stratified train/val/test assignment with EXACT
    per-stratum proportions (each ``slots``-sized run of the stratum's
    hash-ranked documents contributes exactly one val and one test doc
    — 90/5/5 at the defaults), unlike independent Bernoulli draws whose
    split sizes wobble.

    Rank documents within each stratum by an md5 draw (rerun- and
    engine-stable), then slot by rank modulo: one window shuffle on the
    stratum key, map-side after that. The o13 stride-mix pattern with a
    modulo gate instead of a weight."""
    if not (0 <= val_slot < slots and 0 <= test_slot < slots):
        raise ValueError("val_slot/test_slot must be in [0, slots)")
    if val_slot == test_slot:
        raise ValueError("val_slot and test_slot must differ")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    rk = F.row_number().over(w)
    slot = (rk % slots).cast("int")
    return df.select(
        id_col,
        strata_col,
        F.when(slot == val_slot, F.lit("val"))
        .when(slot == test_slot, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass column profiler: per-column non-null count, exact
    distinct count, lexicographic min/max (string canon), and mean
    string length — the data-quality summary a pipeline runs before
    trusting a new corpus drop.

    Single ``agg`` with multiple exact ``countDistinct``s: Catalyst
    plans the standard Expand (one replicate per distinct column) with
    map-side partial aggregation, so the corpus is SCANNED ONCE however
    many columns are profiled — the alternative union-of-per-column
    aggregates re-reads the table per column. The wide single-row
    result is unpivoted with ``stack`` (map-side, no extra exchange).
    """
    # identifiers reach selectExpr as strings, so quote them: backticks
    # (with ``-doubling) for column references, backslash-escaping for
    # the stack() name literals — a column named `a b`, `x'y` or even
    # one containing a backtick profiles correctly instead of producing
    # a parse error or a wrong literal
    def bt(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    def lit(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    aggs = []
    for c in cols:
        # backtick-quoted so a bare '.' in the name is not parsed as
        # struct access; spaced/quoted names profile too
        col = F.col(bt(c))
        s = col.cast("string")
        aggs += [
            F.count(col).cast("bigint").alias(f"_nn_{c}"),
            F.countDistinct(col).cast("bigint").alias(f"_nd_{c}"),
            F.min(s).alias(f"_mn_{c}"),
            F.max(s).alias(f"_mx_{c}"),
            F.avg(F.length(s)).cast("double").alias(f"_al_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).cast("bigint").alias("_n"), *aggs)
    stacked = ", ".join(
        f"{lit(c)}, {bt('_nn_' + c)}, {bt('_nd_' + c)}, "
        f"{bt('_mn_' + c)}, {bt('_mx_' + c)}, {bt('_al_' + c)}"
        for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(column_name, n_nonnull, n_distinct, min_str, max_str, avg_len)",
        "`_n` AS n_rows",
    ).select(
        "column_name",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        "min_str",
        "max_str",
        "avg_len",
    )
