"""unicode_segments (text/segmentation.py; reference
internal/impl/lang/bloblang.go:70-120): UAX #29 grapheme / word /
sentence segmentation, including the reference doc's own examples."""

from __future__ import annotations

import pytest

from connect_spark.text.segmentation import (
    graphemes,
    sentences,
    unicode_segments,
    words,
)


def test_reference_doc_examples():
    # bloblang.go:73-84 — the two documented examples, verbatim
    assert sentences("Hello world. How are you?") == [
        "Hello world. ",
        "How are you?",
    ]
    assert graphemes("\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466❤️") == [
        "\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466",
        "❤️",
    ]


def test_grapheme_clusters():
    # skin-tone modifier stays attached; flags pair RIs; combining marks
    assert graphemes("\U0001F44D\U0001F3FD ok") == [
        "\U0001F44D\U0001F3FD",
        " ",
        "o",
        "k",
    ]
    assert graphemes("\U0001F1FA\U0001F1F8\U0001F1EB\U0001F1F7") == [
        "\U0001F1FA\U0001F1F8",
        "\U0001F1EB\U0001F1F7",
    ]
    assert graphemes("éa") == ["é", "a"]  # é as e+combining


def test_words_uax29_shapes():
    # words include punctuation/whitespace as separate segments and
    # concatenate back to the input (uniseg FirstWordInString)
    assert words("The quick fox") == ["The", " ", "quick", " ", "fox"]
    # WB6/WB7: apostrophe inside a word does not split
    assert words("can't stop") == ["can't", " ", "stop"]
    # WB11/WB12: decimal number holds together
    assert words("jump 32.3 feet, right?") == [
        "jump", " ", "32.3", " ", "feet", ",", " ", "right", "?",
    ]
    # WB6/WB7 with MidNumLet '.': acronym letters chain
    assert words("U.S.A. now")[0] == "U.S.A"
    # WB13a/b: underscore (ExtendNumLet) joins
    assert words("snake_case x") == ["snake_case", " ", "x"]
    # WB9/WB10: letter-digit transitions hold
    assert words("agent007 x")[0] == "agent007"


def test_sentences_uax29_shapes():
    got = sentences("Mr. Smith went home. He slept! Did he? Yes.")
    assert got == [
        "Mr. ",  # SB8: next word starts Upper -> ATerm breaks
        "Smith went home. ",
        "He slept! ",
        "Did he? ",
        "Yes.",
    ]
    # SB6: ATerm x Numeric does not break
    assert sentences("It costs 3.14 dollars.") == [
        "It costs 3.14 dollars."
    ]
    # SB8: lowercase after period -> abbreviation, no break
    assert sentences("e.g. apples are good.") == [
        "e.g. apples are good."
    ]
    # SB9/SB10/SB11: closers and spaces stay with the sentence
    assert sentences('He said "Stop!" Then left.') == [
        'He said "Stop!" ',
        "Then left.",
    ]
    # SB4: paragraph separators force breaks
    assert sentences("One.\nTwo.") == ["One.\n", "Two."]


def test_concat_invariant_and_errors():
    s = "Hello, world!\r\nNew line. \U0001F44D\U0001F3FD done"
    for t in ("grapheme", "word", "sentence"):
        assert "".join(unicode_segments(s, t)) == s
    with pytest.raises(ValueError, match="unknown segmentation type"):
        unicode_segments("x", "paragraph")


def test_bloblang_method(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame(
        [("Hello world. How are you?",)], ["text"]
    )
    src = 'root.sentences = this.text.unicode_segments("sentence")\n' \
          'root.nwords = this.text.unicode_segments("word").size()'
    row = compile_mapping(df, src).collect()[0]
    assert row["sentences"] == ["Hello world. ", "How are you?"]
    # 5 words + 4 spaces + '.' + '?' = 11 segments
    assert row["nwords"] == 11
