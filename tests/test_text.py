"""Text-function parity tests (mirrors ``/root/reference/test/test_utils.jl:4-16``)
plus Python↔Column agreement for the extraction pipeline."""

from __future__ import annotations

import pyspark.sql.functions as F

from openstreetmapio_jl_spark.functions import text as T


def test_url_encode_reference_pairs():
    # exact pairs from test/test_utils.jl:4-9
    assert T.url_encode("hello world") == "hello%20world"
    assert T.url_encode("a=b&c=d") == "a%3Db%26c%3Dd"
    assert T.url_encode("query;param,value") == "query%3Bparam%2Cvalue"
    assert T.url_encode("[bbox]") == "%5Bbbox%5D"
    assert T.url_encode("(around)") == "%28around%29"
    assert T.url_encode("a:b\nc\td") == "a%3Ab%0Ac%09d"


def test_decode_entities_exact_subset():
    assert T.decode_html_entities("a &amp; b") == "a & b"
    assert T.decode_html_entities("&lt;tag&gt;") == "<tag>"
    assert T.decode_html_entities("&quot;q&quot; &#39;s&#39; &apos;a&apos;") == "\"q\" 's' 'a'"
    # entities OUTSIDE the 6-entity subset must NOT decode (unlike html.unescape)
    assert T.decode_html_entities("&nbsp;&eacute;") == "&nbsp;&eacute;"
    # no-& fast path
    assert T.decode_html_entities("plain") == "plain"


def test_extract_text_deterministic():
    html = (
        "<html><head><style>p{}</style></head><body><h1>T &amp; U</h1>"
        "<p>line one</p><p>line   two</p></body></html>"
    )
    assert T.extract_text(html) == "T & U\nline one\nline two"


def test_python_column_agreement(spark):
    """extract_text (python) == extract_text_col (JVM) byte-for-byte — the
    'byte-identical extracted text per url' invariant (BASELINE.json input_hint)."""
    from openstreetmapio_jl_spark.fixtures.generator import make_pages

    pages = make_pages(200, seed=7)
    df = spark.createDataFrame(pages.to_pandas())
    out = df.select(
        "text",
        T.extract_text_col(F.decode(F.col("html"), "UTF-8")).alias("recomputed"),
    ).collect()
    mismatches = [r for r in out if r["text"] != r["recomputed"]]
    assert not mismatches, mismatches[:2]


def test_entity_column_agreement(spark):
    samples = ["a &amp; b", "&lt;x&gt;", "no entities", "&quot;&#39;&apos;", "&nbsp;"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["d"] for r in df.select(T.decode_html_entities_col(F.col("s")).alias("d")).collect()]
    assert got == [T.decode_html_entities(s) for s in samples]


def test_url_encode_column_agreement(spark):
    samples = ["hello world", "a=b&c=d", "[bbox];(x),y:z", "plain"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["d"] for r in df.select(T.url_encode_col(F.col("s")).alias("d")).collect()]
    assert got == [T.url_encode(s) for s in samples]


def test_detect_lang():
    assert T.detect_lang("the cat and the dog is in the house") == "en"
    assert T.detect_lang("der Hund und die Katze ist von mir") == "de"
    assert T.detect_lang("") == "und"
    assert T.detect_lang("12345 !!!") == "und"


def test_token_count_agreement(spark):
    samples = ["hello, world!", "a b c", "", "Straße 42 — im Norden."]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["n"] for r in df.select(T.token_count_col(F.col("s")).alias("n")).collect()]
    assert got == [T.token_count(s) for s in samples]
