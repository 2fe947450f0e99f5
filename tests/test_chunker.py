"""text_chunker recursive_character + markdown strategies
(text_chunker.adoc:85-101)."""

from __future__ import annotations

from connect_spark.text.chunker import split_markdown, split_recursive


def test_recursive_prefers_paragraph_separator():
    text = "para one here\n\npara two here\n\npara three"
    chunks = split_recursive(text, chunk_size=20, chunk_overlap=0)
    assert chunks == ["para one here", "para two here", "para three"]


def test_recursive_descends_separator_hierarchy():
    # one huge paragraph forces descent to "\n", then " "
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    chunks = split_recursive(text, chunk_size=10, chunk_overlap=0)
    assert all(len(c) <= 10 for c in chunks)
    assert " ".join(chunks).split() == text.split()


def test_recursive_overlap_carries_tail():
    text = "aa bb cc dd ee"
    chunks = split_recursive(text, chunk_size=8, chunk_overlap=3)
    assert chunks == ["aa bb cc", "cc dd ee"]  # "cc" carried over


def test_recursive_oversize_atom_splits_charwise():
    # the "" separator is the last resort: an atom longer than
    # chunk_size splits into character windows (langchain semantics)
    text = "short " + "x" * 50 + " tail"
    chunks = split_recursive(text, chunk_size=10, chunk_overlap=0)
    assert all(len(c) <= 10 for c in chunks)
    assert "".join(c.replace(" ", "") for c in chunks) == text.replace(
        " ", ""
    )


def test_markdown_sections():
    md = "intro line\n# Alpha\na body\nmore a\n## Beta\nb body"
    secs = split_markdown(md)
    assert secs == [
        {"header": "", "body": "intro line"},
        {"header": "# Alpha", "body": "a body\nmore a"},
        {"header": "## Beta", "body": "b body"},
    ]


def test_markdown_oversize_body_subsplits():
    md = "# H\n" + ("word " * 200).strip()
    secs = split_markdown(md, chunk_size=100, chunk_overlap=0)
    assert len(secs) > 1
    assert all(s["header"] == "# H" for s in secs)
    assert all(len(s["body"]) <= 100 for s in secs)


def test_markdown_hash_without_space_is_not_header():
    md = "#nothdr\n# real\nbody"
    secs = split_markdown(md)
    assert secs[0] == {"header": "", "body": "#nothdr"}
    assert secs[1] == {"header": "# real", "body": "body"}


def test_pipeline_strategy_param(spark):
    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {
            "generate": {
                "count": 1,
                "mapping": 'root.content = "# A\\nbody a\\n# B\\nbody b"',
            }
        },
        "pipeline": {
            "processors": [
                {"text_chunker": {"strategy": "markdown", "chunk_size": 500}}
            ]
        },
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert [(r.chunk_header, r.chunk) for r in rows] == [
        ("# A", "body a"),
        ("# B", "body b"),
    ]

    cfg2 = {
        "input": {
            "generate": {
                "count": 1,
                "mapping": 'root.content = "aa bb cc dd ee ff"',
            }
        },
        "pipeline": {
            "processors": [
                {
                    "text_chunker": {
                        "strategy": "recursive_character",
                        "chunk_size": 8,
                        "chunk_overlap": 0,
                    }
                }
            ]
        },
    }
    rows2 = build_pipeline(spark, cfg2).dataframe().collect()
    assert [r.chunk for r in rows2] == ["aa bb cc", "dd ee ff"]
