"""Byte-level BPE tokenizer (text/bpe.py): algorithm edge cases plus
the Spark UDF integration."""
from __future__ import annotations

from pyspark.sql import functions as F

from connect_spark.text.bpe import (
    BPETokenizer,
    bpe_count_udf,
    bytes_to_unicode,
    default_tokenizer,
    pretokenize,
    train_bpe,
    unicode_to_bytes,
)


def test_byte_unicode_mapping_is_reversible_256():
    b2u = bytes_to_unicode()
    u2b = unicode_to_bytes()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert all(u2b[c] == b for b, c in b2u.items())
    # printable ascii maps to itself, space does not
    assert b2u[ord("A")] == "A" and b2u[ord(" ")] != " "


def test_pretokenize_contractions_and_spaces():
    assert pretokenize("it's fine") == ["it", "'s", " fine"]
    assert pretokenize("a  b") == ["a", " ", " b"]
    assert pretokenize("x9y") == ["x", "9", "y"]


def test_train_learns_most_frequent_pair_first():
    merges = train_bpe(["aaab aaab aaab"], 2)
    # 'aa' (count 6: two per word overlapping pairs counted per
    # position 1-2 and 2-3) merges before 'ab'
    assert merges[0] == ("a", "a")


def test_tie_breaks_lexicographic_deterministic():
    # "ab" and "cd" each appear twice and share no symbols: counts tie
    # at 2, so ('a','b') < ('c','d') must win round one every run.
    merges = train_bpe(["ab cd ab cd"], 1)
    assert merges[0] == ("a", "b")


def test_encode_decode_roundtrip_utf8():
    tok = default_tokenizer()
    for text in [
        "the quick brown fox", "naïve café 日本語", "🚀 bytes",
        "", "   ", "a\tb\nc", "it's 100% done.",
    ]:
        assert tok.decode(tok.encode(text)) == text


def test_unknown_bytes_fall_back_to_byte_tokens():
    # an emoji is 4 UTF-8 bytes none of which pair in the training
    # sample: must yield exactly 4 single-byte tokens, not fail
    tok = default_tokenizer()
    toks = tok.encode("🚀")
    assert len(toks) == 4
    assert tok.decode(toks) == "🚀"


def test_merge_priority_rank_order():
    # ranks decide application order at encode time: with merges
    # [(b,c),(a,bc)] the word 'abc' becomes ['abc'] in two steps
    tok = BPETokenizer([("b", "c"), ("a", "bc")])
    assert tok.encode("abc") == ["abc"]
    # reversed priority can never form 'abc' because (a,b) merged first
    tok2 = BPETokenizer([("a", "b"), ("ab", "c")])
    assert tok2.encode("abc") == ["abc"]


def test_compression_on_english():
    tok = default_tokenizer()
    text = "the international transformation of information systems"
    n = tok.count(text)
    assert n < len(text) / 2.5  # real subword compression, not chars
    assert n >= len(text.split())  # and at least one token per word


def test_spark_udf_matches_reference(spark):
    tok = default_tokenizer()
    texts = ["the quick brown fox", "it's 12345", "naïve café", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", bpe_count_udf(spark)("text").alias("n")).collect()
    }
    assert got == {i: tok.count(t) for i, t in enumerate(texts)}


def test_pack_sequences_bpe_mode(spark):
    from connect_spark.queries.llmops import pack_sequences

    out = pack_sequences(spark, "/root/testdata/sf0.001", token_mode="bpe")
    rows = out.collect()
    assert len(rows) > 0
    assert {c for c in out.columns} == {
        "shard", "pack_id", "n_docs", "pack_tokens", "first_doc",
        "last_doc"}
    # BPE counts exceed whitespace counts (subwords split words)
    ws_total = sum(
        r["pack_tokens"]
        for r in pack_sequences(spark, "/root/testdata/sf0.001").collect())
    bpe_total = sum(r["pack_tokens"] for r in rows)
    assert bpe_total > ws_total
