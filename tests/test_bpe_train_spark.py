"""Distributed BPE training parity: train_bpe_spark must learn the
EXACT merge table the in-process trainer (text/bpe.py::train_bpe)
learns — same greedy argmax, same (count desc, pair asc) tie-break,
same stop rule."""

from __future__ import annotations

from connect_spark.text.bpe import BPETokenizer, train_bpe
from connect_spark.text.bpe_train import train_bpe_spark, word_counts_df

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "the dog and the fox aren't lazy, they're quick!",
    "a_b a_b a_b snake_case words_with_underscores",
]


def test_parity_with_driver_trainer(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text STRING")
    want = train_bpe(CORPUS, 40)
    got = train_bpe_spark(df, "text", 40, checkpoint_every=8)
    assert got == want


def test_trained_merges_tokenize_losslessly(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text STRING")
    merges = train_bpe_spark(df, "text", 25)
    tok = BPETokenizer(merges)
    for t in CORPUS:
        assert tok.decode(tok.encode(t)) == t


def test_stop_rule_no_repeatable_pair(spark):
    # every pair unique -> best count 1 -> zero merges
    df = spark.createDataFrame([("abcdefg",)], "text STRING")
    assert train_bpe_spark(df, "text", 10) == []


def test_word_counts_vocabulary_sized(spark):
    df = spark.createDataFrame(
        [("to be or not to be",), ("to be to be",)], "text STRING")
    rows = {tuple(r.symbols): r.cnt
            for r in word_counts_df(df, "text").collect()}
    # each doc opens with a plain 'to'; later occurrences carry the
    # leading space (Ġ after the byte->unicode map)
    assert rows[("t", "o")] == 2
    assert rows[("Ġ", "t", "o")] == 2
    assert rows[("Ġ", "b", "e")] == 4
