"""Boilerplate removal (sources/boilerplate.py): classifier rules, the
segmentation invariant vs extract_text, and the Spark plumbing."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocaml_rdf_spark.sources.boilerplate import classify_blocks, main_text, main_text_df, text_blocks
from ocaml_rdf_spark.sources.html_text import extract_text

PAGE = """<html><head><style>p { color: red }</style><title>T</title></head><body>
<nav><a href="/">home</a> <a href="/a">about us</a> <a href="/c">contact</a></nav>
<p>This is the long main article content with many plain words in it.</p>
<p>Short one.</p>
<div>See the <a href="/ref">reference page</a> for details about everything here.</div>
<footer>copyright 2026 <a href="/terms">terms</a></footer>
</body></html>"""


def test_classifier_rules():
    cls = dict(classify_blocks(text_blocks(PAGE)))
    assert cls["home about us contact"] is False  # all-link nav
    assert cls["This is the long main article content with many plain words in it."] is True
    assert cls["Short one."] is False  # under MIN_WORDS
    # inline link "reference page" (14) * 3 < 58 chars → density passes
    assert cls["See the reference page for details about everything here."] is True
    assert cls["copyright 2026 terms"] is False  # 3 words


def test_density_boundary_is_integer_exact():
    # link text exactly 1/3 of the block: "aa bb" link inside 15-char block
    html = '<p>xx <a href="/">yy zz</a> ww uu</p>'
    (block,) = text_blocks(html)
    text, chars, link = block
    assert (chars, link) == (len("xx yy zz ww uu"), len("yy zz"))
    # 5 * 3 >= 14 is false → 5*3=15 > 14 → dropped at the boundary
    assert classify_blocks([block])[0][1] is False


def test_main_text():
    assert main_text(PAGE) == (
        "This is the long main article content with many plain words in it.\n"
        "See the reference page for details about everything here."
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab <>&/\"'=pin", min_size=0, max_size=40),
        min_size=0,
        max_size=6,
    )
)
def test_segmentation_invariant_vs_extract_text(chunks):
    """All block texts joined == extract_text, on adversarial soup."""
    html = "<body>" + "".join(f"<div>{c}</div>" for c in chunks) + "</body>"
    assert "\n".join(t for t, _c, _l in text_blocks(html)) == extract_text(html)


def test_spark_plumbing(spark):
    pages = spark.createDataFrame(
        [("https://h.example/p", PAGE.encode())], "url string, html binary"
    )
    (row,) = main_text_df(pages).collect()
    assert row["n_blocks"] == 6  # title is a block too
    assert row["n_kept"] == 2
    assert row["main_text"].startswith("This is the long")
