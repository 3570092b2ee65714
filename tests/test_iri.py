"""RFC 3986 §5.4 reference-resolution test vectors (the normative cases the
reference's rdf_iri.ml implements — SURVEY §5 item 3)."""

import pytest

from ocaml_rdf_spark.sources.iri import IriError, resolve, url_host

BASE = "http://a/b/c/d;p?q"

# RFC 3986 5.4.1 normal examples
NORMAL = {
    "g:h": "g:h",
    "g": "http://a/b/c/g",
    "./g": "http://a/b/c/g",
    "g/": "http://a/b/c/g/",
    "/g": "http://a/g",
    "//g": "http://g",
    "?y": "http://a/b/c/d;p?y",
    "g?y": "http://a/b/c/g?y",
    "#s": "http://a/b/c/d;p?q#s",
    "g#s": "http://a/b/c/g#s",
    "g?y#s": "http://a/b/c/g?y#s",
    ";x": "http://a/b/c/;x",
    "g;x": "http://a/b/c/g;x",
    "g;x?y#s": "http://a/b/c/g;x?y#s",
    "": "http://a/b/c/d;p?q",
    ".": "http://a/b/c/",
    "./": "http://a/b/c/",
    "..": "http://a/b/",
    "../": "http://a/b/",
    "../g": "http://a/b/g",
    "../..": "http://a/",
    "../../": "http://a/",
    "../../g": "http://a/g",
}

# RFC 3986 5.4.2 abnormal examples
ABNORMAL = {
    "../../../g": "http://a/g",
    "../../../../g": "http://a/g",
    "/./g": "http://a/g",
    "/../g": "http://a/g",
    "g.": "http://a/b/c/g.",
    ".g": "http://a/b/c/.g",
    "g..": "http://a/b/c/g..",
    "..g": "http://a/b/c/..g",
    "./../g": "http://a/b/g",
    "./g/.": "http://a/b/c/g/",
    "g/./h": "http://a/b/c/g/h",
    "g/../h": "http://a/b/c/h",
    "g;x=1/./y": "http://a/b/c/g;x=1/y",
    "g;x=1/../y": "http://a/b/c/y",
    "http:g": "http:g",  # strict parser behavior
}


@pytest.mark.parametrize("ref,expected", list(NORMAL.items()) + list(ABNORMAL.items()))
def test_rfc3986_resolution(ref, expected):
    assert resolve(ref, BASE) == expected


def test_relative_without_base_raises():
    with pytest.raises(IriError):
        resolve("foo/bar", None)


def test_url_host():
    assert url_host("https://User@Host07.Example.ORG:8443/p?q#f") == "host07.example.org"
    assert url_host("https://plain.org/x") == "plain.org"


def test_absolute_iri_passes_through_verbatim():
    # interop rule: absolute references are NOT dot-normalized (N-Triples
    # and Turtle must agree on the same document; rdflib/Jena/Serd do this)
    assert resolve("http://ex.org/.", "http://base.org/") == "http://ex.org/."
    assert resolve("http://ex.org/a/../b", None) == "http://ex.org/a/../b"
    # relative references still get full RFC 3986 treatment
    assert resolve("../b", "http://ex.org/a/c") == "http://ex.org/b"
    assert resolve("./", "http://ex.org/a/c") == "http://ex.org/a/"
