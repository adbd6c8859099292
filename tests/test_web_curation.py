"""URL/domain curation operators (functions/web.py), the second
perceptual-hash family + decode-free size gates (functions/images.py),
and text canonicalization (functions/text.py normalize_*)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.web import (
    filter_blocked_domains,
    registrable_domain,
    url_host,
    url_quality_flags,
)


def _hosts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()]


def test_url_host_extraction(spark):
    got = _hosts(
        spark,
        [
            "https://www.example.com/a/b?q=1",
            "HTTP://WWW.EXAMPLE.COM/X",          # case-folds
            "https://user:pw@sub.host.org:8080/p",  # userinfo + port stripped
            "ftp://files.example.net",
            "not a url",
            "/relative/path",
            "https://1.2.3.4/x",
        ],
    )
    assert got == [
        "www.example.com",
        "www.example.com",
        "sub.host.org",
        "files.example.net",
        None,
        None,
        "1.2.3.4",
    ]


def test_registrable_domain_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("https://www.bbc.co.uk/news",),
            ("https://a.b.example.com/",),
            ("https://example.com",),
            ("https://localhost/x",),
            ("https://10.0.0.1/x",),
            ("garbage",),
        ],
        "url string",
    )
    got = [
        r.d
        for r in df.select(
            registrable_domain(url_host(F.col("url"))).alias("d")
        ).collect()
    ]
    assert got == [
        "bbc.co.uk",      # compound suffix keeps three labels
        "example.com",    # deep subdomain collapses to eTLD+1
        "example.com",
        "localhost",      # single label passes through
        "10.0.0.1",       # raw IP passes through whole
        None,
    ]


def test_url_quality_flags(spark):
    deep = "https://x.com/" + "/".join(["s"] * 12)
    soup = "https://x.com/p?" + "&".join(f"k{i}=v" for i in range(20))
    df = spark.createDataFrame(
        [("https://good.com/a/b?x=1",), (deep,), (soup,),
         ("https://9.9.9.9/a",), ("nope",), (None,)],
        "url string",
    )
    rows = df.select(url_quality_flags(F.col("url")).alias("f")).collect()
    flags = [r.f.asDict() for r in rows]
    assert flags[0]["ok"] and not any(
        v for k, v in flags[0].items() if k != "ok"
    )
    assert flags[1]["deep_path"] and not flags[1]["ok"]
    assert flags[2]["query_soup"] and not flags[2]["ok"]
    assert flags[3]["ip_host"] and not flags[3]["ok"]
    assert flags[4]["no_host"] and not flags[4]["ok"]
    assert flags[5]["no_host"] and not flags[5]["ok"]


def test_filter_blocked_domains_list_and_frame(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spamfarm.biz/x"),
            (2, "https://www.spamfarm.biz/y"),   # same registrable domain
            (3, "https://good.org/a"),
            (4, "not-a-url"),                    # unparseable -> kept
        ],
        "id long, url string",
    )
    survivors = lambda out: sorted(r.id for r in out.collect())  # noqa: E731
    assert survivors(filter_blocked_domains(df, "url", ["spamfarm.biz"])) == [3, 4]
    block_df = spark.createDataFrame([("spamfarm.biz",)], "domain string")
    assert survivors(filter_blocked_domains(df, "url", block_df)) == [3, 4]
    assert survivors(filter_blocked_domains(df, "url", [])) == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# dHash + size gates
# ---------------------------------------------------------------------------

def _img(seed: int, w: int = 32, h: int = 32) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_difference_hash_brightness_invariant_and_distinct():
    from gchq_data_quality_spark.functions.images import (
        average_hash,
        difference_hash,
    )

    img = _img(7)
    brighter = np.clip(img.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    # a global brightness shift preserves every horizontal gradient sign
    # (clipping aside) -> dHash nearly unchanged, while aHash may move
    d0, d1 = difference_hash(img), difference_hash(brighter)
    assert bin((d0 ^ d1) & ((1 << 64) - 1)).count("1") <= 4
    # different images -> far-apart hashes
    d2 = difference_hash(_img(8))
    assert bin((d0 ^ d2) & ((1 << 64) - 1)).count("1") > 10
    # dHash is a different family than aHash
    assert difference_hash(img) != average_hash(img)
    # signed-64 convention
    assert -(1 << 63) <= d0 < (1 << 63)


def test_with_image_ahash_dhash_method(spark):
    from gchq_data_quality_spark.functions.images import (
        difference_hash,
        encode_ppm,
        with_image_ahash,
    )

    img = _img(3)
    df = spark.createDataFrame(
        [("a", bytearray(encode_ppm(img)), "ppm"),
         ("b", bytearray(b"P6\ngarbage"), "ppm"),
         ("c", bytearray(b"\x89PNG..."), "png")],
        "image_id string, bytes binary, fmt string",
    )
    rows = {r.image_id: r for r in with_image_ahash(df, method="dhash").collect()}
    assert rows["a"].ahash == difference_hash(img) and rows["a"].decode_ok
    assert rows["b"].ahash is None and not rows["b"].decode_ok
    assert rows["c"].ahash is None and not rows["c"].decode_ok
    with pytest.raises(ValueError):
        with_image_ahash(df, method="phash")


def test_image_size_flags(spark):
    from gchq_data_quality_spark.functions.images import image_size_flags

    df = spark.createDataFrame(
        [("tiny", 32, 500), ("banner", 900, 100), ("ok", 512, 512),
         ("bomb", 20000, 20000), ("nodims", None, None)],
        "name string, w int, h int",
    )
    rows = {
        r.name: r.f.asDict()
        for r in df.select(
            "name", image_size_flags(F.col("w"), F.col("h")).alias("f")
        ).collect()
    }
    assert rows["tiny"]["too_small"] and not rows["tiny"]["ok"]
    assert rows["banner"]["extreme_aspect"] and not rows["banner"]["ok"]
    assert rows["ok"]["ok"] and not rows["ok"]["too_small"]
    assert rows["bomb"]["too_large"] and not rows["bomb"]["ok"]
    assert rows["nodims"] == {
        "too_small": False, "extreme_aspect": False,
        "too_large": False, "ok": False,
    }


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def test_normalize_whitespace_and_fingerprint(spark):
    from gchq_data_quality_spark.functions.text import (
        normalize_whitespace,
        normalized_fingerprint,
    )

    df = spark.createDataFrame(
        [("  Hello\t\tWorld \x00\x07 !\n",), ("hello world !",), (None,)],
        "t string",
    )
    out = df.select(
        normalize_whitespace(F.col("t")).alias("n"),
        normalize_whitespace(F.col("t"), lowercase=True).alias("nl"),
        normalized_fingerprint(F.col("t")).alias("fp"),
    ).collect()
    assert out[0].n == "Hello World !"
    assert out[0].nl == "hello world !"
    assert out[1].n == "hello world !"
    # trivially-reformatted texts share one dedup fingerprint
    assert out[0].fp == out[1].fp
    assert out[2].n is None


def test_normalize_unicode_nfkc(spark):
    from gchq_data_quality_spark.functions.text import normalize_unicode

    df = spark.createDataFrame(
        [("Ｈｅｌｌｏ",),  # full-width "Hello"
         ("cafe\u0301",),                   # combining acute -> precomposed
         (None,)],
        "t string",
    )
    got = [r.n for r in df.select(normalize_unicode(F.col("t")).alias("n")).collect()]
    assert got == ["Hello", "caf\u00e9", None]
    with pytest.raises(ValueError):
        normalize_unicode(F.col("t"), form="NFX")


# ---------------------------------------------------------------------------
# HTML -> text extraction
# ---------------------------------------------------------------------------

def test_strip_html_extracts_structured_text(spark):
    from gchq_data_quality_spark.functions.web import strip_html

    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- comment --><h1>Heading One</h1>"
        "<p>First&nbsp;paragraph &amp; more.</p>"
        "<div>Second   block with &lt;tags&gt; quoted.</div>"
        "<ul><li>item one</li><li>item two</li></ul></body></html>"
    )
    df = spark.createDataFrame([(html,), (None,), ("plain text only",)], "h string")
    got = [r.t for r in df.select(strip_html(F.col("h")).alias("t")).collect()]
    assert got[0] == (
        "T\n\nHeading One\nFirst paragraph & more.\n"
        "Second block with <tags> quoted.\nitem one\nitem two"
    ), got[0]
    assert got[1] is None
    assert got[2] == "plain text only"


def test_strip_html_squeezes_blank_runs_not_paragraphs(spark):
    from gchq_data_quality_spark.functions.web import strip_html

    html = "<p>one</p>\n\n\n\n<p>two</p>"
    df = spark.createDataFrame([(html,)], "h string")
    got = df.select(strip_html(F.col("h")).alias("t")).collect()[0].t
    assert got == "one\n\ntwo"  # max one blank line survives


def test_extract_links(spark):
    from gchq_data_quality_spark.functions.web import extract_links

    html = (
        '<a href="https://a.com/x">A</a> text '
        "<A HREF='https://b.org/y?z=1'>B</A>"
        "<a class=\"c\" href=\"/relative\">C</a><a>no href</a>"
    )
    df = spark.createDataFrame([(html,), (None,), ("no anchors",)], "h string")
    got = [r.l for r in df.select(extract_links(F.col("h")).alias("l")).collect()]
    assert got[0] == ["https://a.com/x", "https://b.org/y?z=1", "/relative"]
    assert got[1] is None
    assert got[2] == []
