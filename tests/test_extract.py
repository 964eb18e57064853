from openlogreplicator_spark.functions.extract import EXTRACT_VERSION, extract_text


def test_basic_strip():
    assert (
        extract_text(b"<html><body><p>hello  world</p></body></html>")
        == "hello world"
    )


def test_script_style_dropped():
    html = b"<html><script>var x = '<p>no</p>';</script><style>p{}</style><b>yes</b></html>"
    assert extract_text(html) == "yes"


def test_entities():
    assert extract_text(b"<p>a &amp; b &lt;c&gt; &#x2603; &#65;</p>") == "a & b <c> ☃ A"


def test_unicode_and_invalid_bytes():
    assert extract_text("<p>café 東京</p>".encode()) == "café 東京"
    # invalid utf-8 → deterministic U+FFFD, never an exception
    assert extract_text(b"<p>a\xff\xfeb</p>") == "a��b"


def test_none_and_empty():
    assert extract_text(None) is None
    assert extract_text(b"") == ""


def test_pure_and_frozen():
    h = b"<html><body><p>repeat &amp; repeat</p></body></html>"
    assert extract_text(h) == extract_text(h)
    assert EXTRACT_VERSION == 1


def test_jvm_expression_extraction_matches_frozen_kernel(spark):
    """docs_html_text_extract's extract_match column must be ALL TRUE: the
    pure-JVM regexp chain reproduces the frozen Arrow-kernel extraction
    byte-for-byte on every html payload in the replay fixture (the oracle
    hash-compares the md5s engine-to-engine; this pins the third leg —
    expression == kernel)."""
    from openlogreplicator_spark.queries import QUERIES

    df = QUERIES["docs_html_text_extract"](spark, "/root/testdata/sf0.001")
    n_total = df.count()
    n_match = df.filter("extract_match").count()
    assert n_total > 0 and n_match == n_total
