"""Training-data prep operators (operators/prep.py): chunking is
lossless, decontamination drops exactly the overlapping docs, sampling
is deterministic/nested/engine-portable, redaction counts are right."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from finporter_spark.operators.prep import (
    chunk_documents,
    decontaminate,
    redact,
    sample_bucket,
    stratified_sample,
)
from finporter_spark.queries.catalog import _t


def test_chunks_reassemble_to_original(spark, sf_dir):
    """Dropping each chunk's leading overlap and concatenating in
    chunk_id order must reproduce the document exactly — no byte lost
    or duplicated."""
    docs = _t(spark, sf_dir, "documents").limit(50)
    chunks = chunk_documents(docs, chunk_chars=80, overlap=16)
    rebuilt = (
        chunks.withColumn(
            "piece",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
                F.substring(F.col("chunk_text"), 17, 80)
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_id", "piece")))
                .getField("piece")
            ).alias("rebuilt")
        )
    )
    joined = docs.join(rebuilt, "doc_id").select("text", "rebuilt").collect()
    assert len(joined) == 50
    for r in joined:
        assert r.rebuilt == r.text


def test_chunk_empty_doc_kept(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="")])
    out = chunk_documents(df, chunk_chars=10, overlap=2).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "" and out[0].chunk_id == 0


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=5, overlap=5)


def test_decontaminate_drops_planted_overlap(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    train = spark.createDataFrame(
        [
            # shares the 5-gram "quick brown fox jumps over"
            Row(doc_id=1, text="a quick brown fox jumps over everything"),
            Row(doc_id=2, text="completely unrelated words appear in here now"),
            Row(doc_id=3, text="too short"),  # <5 tokens -> no grams -> kept
        ]
    )
    kept = sorted(
        r.doc_id
        for r in decontaminate(train, bench, ngram_n=5).select("doc_id").collect()
    )
    assert kept == [2, 3]


def test_stratified_sample_deterministic_and_nested(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    small = stratified_sample(
        docs, "doc_id", {"en": 0.2}, "lang", default_fraction=0.1
    )
    big = stratified_sample(
        docs, "doc_id", {"en": 0.5}, "lang", default_fraction=0.3
    )
    small_ids = {r.doc_id for r in small.select("doc_id").collect()}
    again = {r.doc_id for r in small.select("doc_id").collect()}
    big_ids = {r.doc_id for r in big.select("doc_id").collect()}
    assert small_ids == again  # rerun-stable
    assert small_ids <= big_ids  # nested: bigger fraction is a superset
    n_en = docs.filter(F.col("lang") == "en").count()
    n_en_sampled = (
        big.filter(F.col("lang") == "en").count()
    )
    assert abs(n_en_sampled / n_en - 0.5) < 0.15  # unbiased-ish rate


def test_sample_bucket_matches_duckdb(spark):
    """The md5 bucket must be bit-identical in DuckDB — that is the whole
    point of using md5 over engine-native hashes."""
    df = spark.range(0, 500).select(
        F.col("id"), sample_bucket(F.col("id")).alias("b")
    )
    got = {r.id: r.b for r in df.collect()}
    want = dict(
        duckdb.connect()
        .execute(
            "SELECT i, CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8)"
            "            AS BIGINT) % 10000"
            " FROM range(500) t(i)"
        )
        .fetchall()
    )
    assert got == want


def test_redact_counts_and_order(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, t="mail a@b.com and c@d.org, ssn 12-34"),
            Row(k=2, t="nothing to hide"),
        ]
    )
    out = {
        r.k: r
        for r in redact(
            df,
            "t",
            [(r"[\w.]+@[\w.]+", "[EMAIL]"), (r"\d{2}-\d{2}", "[NUM]")],
        ).collect()
    }
    assert out[1].t == "mail [EMAIL] and [EMAIL], ssn [NUM]"
    assert out[1].n_redactions == 3
    assert out[2].t == "nothing to hide" and out[2].n_redactions == 0


def test_redact_out_col_overwrites_existing(spark):
    """out_col naming a pre-existing column replaces it instead of
    emitting an ambiguous duplicate."""
    df = spark.createDataFrame([Row(k=1, t="a@b.com", clean="stale")])
    out = redact(df, "t", [r"[\w.]+@[\w.]+"], out_col="clean")
    assert out.columns.count("clean") == 1
    row = out.collect()[0]
    assert row.clean == "[REDACTED]" and row.t == "a@b.com"


def test_repetition_profile_exact_values(spark):
    from finporter_spark.operators.prep import repetition_profile

    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "x y z w v u"), (3, ""), (4, "q r")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_profile(df).collect()}
    # 9 tokens -> 7 3-grams: 'a b c'x3, 'b c a'x2, 'c a b'x2 -> all dup
    assert got[1].n_ngrams == 7
    assert got[1].dup_frac == 1.0
    assert abs(got[1].top_frac - 3 / 7) < 1e-12
    assert (got[2].n_ngrams, got[2].dup_frac, got[2].top_frac) == (4, 0.0, 0.25)
    # short/empty docs emit zero-rows, not dropped rows
    assert (got[3].n_ngrams, got[4].n_ngrams) == (0, 0)


def test_pack_sequences_invariants(spark, sf_dir):
    from finporter_spark.operators.prep import pack_sequences
    from finporter_spark.operators.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = pack_sequences(docs, seq_tokens=512, shards=8).cache()

    # every interior sequence of a shard is exactly full; only the last
    # may be ragged
    agg = p.groupBy("shard", "seq_id").agg(F.sum("n_toks").alias("s"))
    mx = agg.groupBy("shard").agg(F.max("seq_id").alias("m"))
    assert (
        agg.join(mx, "shard")
        .filter((F.col("seq_id") < F.col("m")) & (F.col("s") != 512))
        .count()
        == 0
    )
    # token conservation: every document's tokens land exactly once
    per_doc = p.groupBy("doc_id").agg(F.sum("n_toks").alias("packed"))
    truth = docs.select(
        "doc_id", token_count(F.col("text"), mode="ws").alias("n")
    )
    assert (
        per_doc.join(truth, "doc_id")
        .filter(F.col("packed") != F.col("n"))
        .count()
        == 0
    )
    assert per_doc.count() == docs.count()
    # boundary-crossing spans are contiguous: a doc's chunks start at 0
    # and each next chunk starts where the previous ended
    spans = p.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("doc_tok_start", "n_toks"))
        ).alias("sp")
    )
    bad = spans.filter(
        F.exists(
            F.transform(
                F.col("sp"),
                lambda s, i: (
                    s["doc_tok_start"]
                    != F.coalesce(
                        F.get(F.col("sp"), i - 1)["doc_tok_start"]
                        + F.get(F.col("sp"), i - 1)["n_toks"],
                        F.lit(0),
                    )
                ),
            ),
            lambda x: x,
        )
    ).count()
    assert bad == 0
    p.unpersist()


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    """A training doc that is a light edit of a benchmark doc (no shared
    5-gram needed — high estimated Jaccard of 3-gram shingles) is
    dropped; unrelated docs survive; docs with no shingles are kept."""
    from finporter_spark.operators.prep import fuzzy_decontaminate

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    bench = spark.createDataFrame([Row(doc_id=100, text=base)])
    train = spark.createDataFrame(
        [
            # one word swapped -> near-dup of the benchmark text
            Row(doc_id=1, text=base.replace("omicron", "OMICRON")),
            Row(doc_id=2, text="completely unrelated words appear here "
                               "and keep going for a while longer"),
            Row(doc_id=3, text="too short"),
        ]
    )
    kept = sorted(
        r.doc_id
        for r in fuzzy_decontaminate(
            train, bench, est_jaccard_threshold=0.5
        ).select("doc_id").collect()
    )
    assert kept == [2, 3]


def test_three_way_split_exact_proportions(spark, sf_dir):
    """Each stratum of n docs must yield exactly floor/ceil(n/20) val
    and test rows (rank-modulo exactness — the property Bernoulli
    splits lack), assignments must be rerun-stable, and every doc
    appears exactly once."""
    from finporter_spark.operators.prep import three_way_split

    docs = _t(spark, sf_dir, "documents")
    out = three_way_split(docs)
    n_docs = docs.count()
    assert out.count() == n_docs
    per = {
        (r["source"], r["split"]): r["n"]
        for r in out.groupBy("source", "split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    totals = {}
    for (src, _), n in per.items():
        totals[src] = totals.get(src, 0) + n
    for src, n in totals.items():
        # ranks 1..n: val on rk%20==1, test on rk%20==2
        exp_val = len([r for r in range(1, n + 1) if r % 20 == 1])
        exp_test = len([r for r in range(1, n + 1) if r % 20 == 2])
        assert per.get((src, "val"), 0) == exp_val, src
        assert per.get((src, "test"), 0) == exp_test, src
    # deterministic across reruns
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, three_way_split(docs).collect()))
    assert a == b


def test_span_dedup_planted_duplicate_dropped(spark):
    """A doc that restates an earlier doc's text verbatim (plus a short
    novel tail) must cross the 50% duplicated-span threshold and be
    marked keep=false; the original and an unrelated doc stay kept."""
    from finporter_spark.operators.prep import span_dedup_stats

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    other = "kilo lima mike november oscar papa quebec romeo sierra tango"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " extra1 extra2"),  # mostly copied
        Row(doc_id=3, text=other),
        Row(doc_id=4, text="too short"),  # < 8 tokens: no spans
    ]
    out = {
        r["doc_id"]: r
        for r in span_dedup_stats(
            spark.createDataFrame(rows), ngram_n=8
        ).collect()
    }
    assert out[1]["n_dup"] == 0 and out[1]["keep"]
    assert out[3]["n_dup"] == 0 and out[3]["keep"]
    # doc 2 has 5 spans; 3 of them (positions 0-2 within base) already
    # appeared in doc 1
    assert out[2]["n_spans"] == 5
    assert out[2]["n_dup"] == 3
    assert not out[2]["keep"]
    assert 4 not in out  # sub-n docs carry no spans


def test_bm25_ranks_term_dense_doc_higher(spark):
    """More query-term occurrences (tf) at equal length must score
    higher; a doc with no query terms must be absent; rarer terms must
    contribute more than common ones (idf monotonicity)."""
    from finporter_spark.operators.text import bm25_scores

    rows = [
        Row(doc_id=1, text="spark spark spark pad pad pad pad pad"),
        Row(doc_id=2, text="spark pad pad pad pad pad pad pad"),
        Row(doc_id=3, text="pad pad pad pad pad pad pad pad"),
        # 'rare' appears in one doc, 'spark' in three
        Row(doc_id=4, text="rare pad pad pad pad pad pad pad"),
        Row(doc_id=5, text="spark pad pad pad pad pad pad pad"),
    ]
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(
            spark.createDataFrame(rows), ["spark", "rare"]
        ).collect()
    }
    assert 3 not in out
    assert out[1] > out[2] > 0
    assert out[4] > out[5]  # same tf/dl, rarer term -> higher idf


def test_profile_columns_single_scan_and_values(spark, sf_dir):
    """Profiler values must match per-column recomputation, and the
    plan must contain exactly ONE parquet scan (Expand-based
    multi-distinct, not a union of per-column re-reads)."""
    from finporter_spark.operators.prep import profile_columns

    docs = _t(spark, sf_dir, "documents")
    out = {
        r["column_name"]: r
        for r in profile_columns(docs, ["lang", "n_chars"]).collect()
    }
    n = docs.count()
    langs = docs.select("lang").distinct().count()
    assert out["lang"]["n_rows"] == n
    assert out["lang"]["n_distinct"] == langs
    assert out["n_chars"]["min_str"] == str(
        docs.agg(F.min(F.col("n_chars").cast("string"))).collect()[0][0]
    )
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_columns(docs, ["lang", "n_chars"]).explain("formatted")
    p = buf.getvalue()
    import re

    # count detail headers, not tree lines (each node prints twice)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Expand" in p


def test_profile_columns_metachar_names(spark):
    """ADVICE (low): column names containing spaces, quotes, dots, or
    backticks must profile correctly — identifiers are backtick-quoted
    and stack() name literals escaped, so no parse error / wrong
    literal."""
    from finporter_spark.operators.prep import profile_columns

    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, "y", None), (None, "y", 4.0)],
        ["a b", "it's", "dot.ted",],
    )
    out = {
        r["column_name"]: r
        for r in profile_columns(df, ["a b", "it's", "dot.ted"]).collect()
    }
    assert set(out) == {"a b", "it's", "dot.ted"}
    assert out["a b"]["n_nonnull"] == 2
    assert out["it's"]["n_distinct"] == 2
    assert out["dot.ted"]["min_str"] == "2.0"
    assert all(r["n_rows"] == 3 for r in out.values())
