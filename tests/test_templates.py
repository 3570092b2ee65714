"""Cross-page template detection (operators/templates.py): the frequency
rule, the MIN_PAGES floor, block-order reassembly, and the all-template
page edge."""

from __future__ import annotations

from ocaml_rdf_spark.operators.templates import strip_templates


def _pages(spark, rows):
    return spark.createDataFrame(
        [(url, html.encode()) for url, html in rows], "url string, html binary"
    )


def _site(host, n, body):
    """n pages on `host`; body(i) -> html body string."""
    return [(f"https://{host}/p/{i}", f"<html><body>{body(i)}</body></html>") for i in range(n)]


def test_host_constant_chrome_dropped(spark):
    rows = _site(
        "a.example",
        4,
        lambda i: f"<nav>home about contact</nav><p>unique article body {i} here</p><footer>terms</footer>",
    )
    out = {r["url"]: r for r in strip_templates(_pages(spark, rows)).collect()}
    assert len(out) == 4
    for i in range(4):
        r = out[f"https://a.example/p/{i}"]
        assert r["main_text"] == f"unique article body {i} here"
        assert (r["n_blocks"], r["n_kept"]) == (3, 1)


def test_min_pages_floor_protects_tiny_hosts(spark):
    # 2-page host: content differs, chrome repeats on both pages (2*2 >= 2).
    # A unique block appears once: 1 < MIN_PAGES, so it must survive even
    # though 1*2 >= 2 would flag it on a 1-page host without the floor.
    rows = _site("b.example", 1, lambda i: "<p>only page body text</p>")
    (r,) = strip_templates(_pages(spark, rows)).collect()
    assert r["main_text"] == "only page body text"
    assert (r["n_blocks"], r["n_kept"]) == (1, 1)


def test_all_template_page_yields_empty_main_text(spark):
    rows = _site("c.example", 3, lambda i: "<nav>same nav</nav><footer>same footer</footer>")
    out = strip_templates(_pages(spark, rows)).collect()
    assert len(out) == 3
    for r in out:
        assert r["main_text"] == ""
        assert (r["n_blocks"], r["n_kept"]) == (2, 0)


def test_templates_are_per_host(spark):
    # identical chrome text on two hosts -> counted per host, both flagged;
    # content shared by both pages of host d (2/2 pages) IS a template there
    rows = _site("d.example", 2, lambda i: "<nav>shared nav</nav><p>same body</p>") + _site(
        "e.example", 2, lambda i: f"<nav>shared nav</nav><p>body {i}</p>"
    )
    out = {r["url"]: r for r in strip_templates(_pages(spark, rows)).collect()}
    assert out["https://d.example/p/0"]["main_text"] == ""  # body repeated on all host pages
    assert out["https://e.example/p/0"]["main_text"] == "body 0"
    assert out["https://e.example/p/1"]["main_text"] == "body 1"


def test_exact_half_boundary_is_template(spark):
    # 4-page host; banner on exactly pages 0,1 (2*2 >= 4 -> template);
    # rarer one-page banner survives (1 < MIN_PAGES)
    rows = _site(
        "g.example",
        4,
        lambda i: f"<p>article {i}</p>"
        + ("<div>half banner</div>" if i < 2 else "")
        + ("<div>rare banner</div>" if i == 0 else ""),
    )
    out = {r["url"]: r for r in strip_templates(_pages(spark, rows)).collect()}
    assert out["https://g.example/p/0"]["main_text"] == "article 0\nrare banner"
    assert out["https://g.example/p/1"]["main_text"] == "article 1"
    assert out["https://g.example/p/3"]["main_text"] == "article 3"


def test_block_order_preserved(spark):
    rows = _site(
        "f.example",
        2,
        lambda i: f"<p>alpha {i}</p><nav>chrome nav</nav><p>beta {i}</p><p>gamma {i}</p>",
    )
    out = {r["url"]: r for r in strip_templates(_pages(spark, rows)).collect()}
    assert out["https://f.example/p/1"]["main_text"] == "alpha 1\nbeta 1\ngamma 1"
