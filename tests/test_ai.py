"""AI chat / moderation shims (text/ai.py): injectable model contract,
deterministic fakes, batch shape."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from connect_spark.text.ai import (
    ai_chat,
    ai_moderation,
    fake_chat_model,
    fake_moderation_model,
)


def test_chat_json_extraction(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "")], ["id", "text"]
    )
    out = ai_chat(df, "text", response_format="json").collect()
    by_id = {r["id"]: json.loads(r["reply"]) for r in out}
    assert by_id[1] == {"n_chars": 16, "n_words": 3, "head": "alpha beta gamma"}
    assert by_id[2] == {"n_chars": 0, "n_words": 0, "head": ""}


def test_chat_text_mode_and_prompt_column(spark):
    df = spark.createDataFrame([(1, "one two three")], ["id", "text"])
    # prompt can be a Column expression (interpolated-string analogue)
    out = ai_chat(
        df, F.concat(F.lit("Summarize: "), F.col("text"))
    ).collect()
    assert out[0]["reply"] == "SUMMARY(4 words): Summarize: one two three"


def test_chat_injectable_model_fn_sees_config(spark):
    # model_fn runs executor-side, so the request contract is asserted
    # by echoing each request dict back as the reply.
    def fn(reqs):
        return [json.dumps(r, sort_keys=True) for r in reqs]

    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    out = ai_chat(
        df,
        "text",
        model="gpt-test",
        system_prompt="sys",
        max_tokens=7,
        temperature=0.5,
        model_fn=fn,
    ).collect()
    assert json.loads(out[0]["reply"]) == {
        "model": "gpt-test",
        "system_prompt": "sys",
        "response_format": "text",
        "max_tokens": 7,
        "temperature": 0.5,
        "prompt": "x",
    }


def test_chat_rejects_bad_format(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    try:
        ai_chat(df, "text", response_format="yaml")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_moderation_flag_terms(spark):
    df = spark.createDataFrame(
        [(1, "all good here"), (2, "contains DATA leak")], ["id", "text"]
    )
    out = ai_moderation(df, "text", flag_terms=("data",)).collect()
    safe = {r["id"]: r["safe"] for r in out}
    assert safe == {1: "yes", 2: "no"}


def test_moderation_with_prompt_context(spark):
    df = spark.createDataFrame([(1, "resp", "why?")], ["id", "r", "p"])
    out = ai_moderation(df, "r", prompt="p", flag_terms=()).collect()
    assert out[0]["safe"] == "yes"
    assert "_ai_resp" not in out[0].asDict()


def test_fake_models_are_pure():
    reqs = [
        {"prompt": "a b", "response_format": "json"},
        {"prompt": "a b", "response_format": "text"},
    ]
    assert fake_chat_model(reqs) == fake_chat_model(reqs)
    m = [{"response": "Boom crash", "flag_terms": ("crash",)}]
    assert fake_moderation_model(m) == ["no"]
