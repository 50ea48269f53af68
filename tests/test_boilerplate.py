"""jusText-flavored boilerplate removal (operators/boilerplate.py):
link-dense nav/footer dropped, article prose kept, context
promotion of short sandwiched blocks, edge rules."""

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.boilerplate import (
    extract_main_content,
)

GOOD_PARA = (
    "This is the actual article content and it talks at length about "
    "the subject of the page with many ordinary words that a reader "
    "would expect to find in the body of a well written article, and "
    "it keeps going for long enough that the length test is passed "
    "comfortably by this block of prose."
)
GOOD_PARA2 = (
    "A second long paragraph of the article continues the discussion "
    "and it is also full of the usual function words so that the "
    "classifier can see that this block is running prose as well, "
    "with enough of them in a row that it clears the context-free "
    "length threshold on its own merits."
)

PAGE = f"""
<html><head><title>t</title><script>var x = 1;</script></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/faq">FAQ</a></nav>
<div><a href="/p1">Related post one</a> <a href="/p2">Related post two</a></div>
<h1>The headline of it all</h1>
<p>{GOOD_PARA}</p>
<p>Short aside.</p>
<p>{GOOD_PARA2}</p>
<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a> (c) 2026</footer>
</body></html>
"""


def _run(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(extract_main_content("h", **kw).alias("t")).first().t


def test_article_kept_boilerplate_dropped(spark):
    out = _run(spark, PAGE)
    assert GOOD_PARA in out and GOOD_PARA2 in out
    assert "Home" not in out and "Related post" not in out
    assert "Privacy" not in out
    # the short aside is sandwiched between two good paragraphs ->
    # context-promoted
    assert "Short aside." in out


def test_short_block_without_good_context_dropped(spark):
    html = """
    <p><a href="/x">some link text here</a></p>
    <p>Tiny orphan line.</p>
    <p><a href="/y">another link heavy block</a></p>
    """
    out = _run(spark, html)
    assert out == ""


def test_link_farm_yields_empty(spark):
    html = "".join(
        f'<p><a href="/l{i}">interesting link number {i}</a></p>'
        for i in range(10)
    )
    assert _run(spark, html) == ""


def test_plain_prose_survives_untagged(spark):
    assert _run(spark, f"<p>{GOOD_PARA}</p>") == GOOD_PARA


def test_stopword_poor_text_dropped(spark):
    # long but no function words: catalog/spec dump, not prose
    catalog = " ".join(f"SKU-{i:05d} 19.99 BLUE XL" for i in range(40))
    out = _run(spark, f"<p>{catalog}</p><p>{GOOD_PARA}</p>")
    assert GOOD_PARA in out and "SKU-00000" not in out


def test_null_and_malformed(spark):
    df = spark.createDataFrame(
        [(None,), ("<p unclosed" ,)], "h string"
    )
    rows = df.select(extract_main_content("h").alias("t")).collect()
    assert rows[0].t is None
    assert rows[1].t == ""  # malformed: parsed best-effort, no prose


def test_single_arrow_eval_in_plan(spark):
    from trial_submission_studio_spark.operators.planaudit import plan_facts

    df = spark.createDataFrame([(PAGE,)], "h string")
    f = plan_facts(df.select(extract_main_content("h").alias("t")))
    assert f["python_evals"] == 1 and f["shuffle_exchanges"] == 0
