"""BPE tokenizer: the distributed trainer must reproduce a pure-Python
reference exactly, and encoding must roundtrip every document.

The SQL oracle can't express the merge recursion (l21 is a declared
≈-operator), so these tests ARE the correctness gate: same corpus in,
same merges and same token streams out, via two independent code paths
(Spark word-frequency agg + driver merge loop vs collections.Counter
over pandas)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from finporter_spark.operators.tokenizer import (
    END,
    bpe_decode_tokens,
    bpe_encode,
    encode_word,
    load_or_train_merges,
    train_bpe,
    word_frequencies,
)


def _norm(text: str) -> str:
    return " ".join(text.lower().split())


def test_trainer_matches_pure_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # reference path: plain Counter over pandas — no Spark involved
    pdf = docs.select("text").toPandas()
    counter = collections.Counter()
    for t in pdf["text"]:
        counter.update(_norm(t).split())
    ref_merges = train_bpe(sorted(counter.items()), n_merges=80)

    # distributed path: Spark word-frequency aggregation
    wf = [(r.word, r.freq) for r in word_frequencies(docs).collect()]
    assert dict(wf) == dict(counter)  # the corpus-sized pass agrees
    spark_merges = train_bpe(sorted(wf), n_merges=80)
    assert spark_merges == ref_merges


def test_encode_decode_roundtrip_every_document(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = [(r.word, r.freq) for r in word_frequencies(docs).collect()]
    merges = train_bpe(sorted(wf), n_merges=60)
    out = bpe_encode(docs, merges).join(docs.select("doc_id", "text"), "doc_id")
    bad = 0
    for r in out.collect():
        if bpe_decode_tokens(list(r.tokens)) != _norm(r.text):
            bad += 1
    assert bad == 0
    # tokens must compress: merged symbols beat characters
    n_tok = out.agg(F.sum("n_tokens")).first()[0]
    n_char_tokens = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    ).first()[0]
    assert n_tok < n_char_tokens


def test_merge_cache_is_dataset_state(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "merges")
    m1 = load_or_train_merges(docs, path, fingerprint="fp1", n_merges=40)
    m2 = load_or_train_merges(docs, path, fingerprint="fp1", n_merges=40)
    assert m1 == m2 and len(m1) == 40
    # a changed budget or corpus fingerprint retrains
    m3 = load_or_train_merges(docs, path, fingerprint="fp1", n_merges=20)
    assert len(m3) == 20 and m3 == m1[:20]  # BPE merges are prefix-stable


def test_encode_word_applies_lowest_rank_first():
    # vocab: merges learned in order (a,b) then (ab,c): "abc" -> "abc</w>"?
    # ranks decide the application order exactly like GPT-2 BPE
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", END): 2}
    out = encode_word("abc", ranks)
    assert "".join(out) == "abc" + END
    assert out == ["abc", END]  # (a,b) first, then (ab,c); (c,</w>) unused
    # a word with no applicable merges stays characters + end marker
    assert encode_word("xy", {}) == ["x", "y", END]
