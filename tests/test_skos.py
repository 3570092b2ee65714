"""SKOS audit (operators/skos.py) — SKOS Reference S13/S14 integrity
conditions + qSKOS quality issues on a hand-built concept scheme."""

from ocaml_rdf_spark.operators.skos import SKOS, skos_audit
from ocaml_rdf_spark.types import RDF_TYPE

COLS = "s_kind tinyint, s_lex string, pred string, o_kind tinyint, o_lex string, o_dtype string, o_lang string, graph string"


def iri(s, p, o):
    return (0, s, p, 0, o, None, None, "urn:g:skos")

def lab(s, p, lex, lang="en"):
    return (0, s, p, 2, lex, None, lang, "urn:g:skos")


def build(spark, rows):
    return spark.createDataFrame(rows, COLS)


def audit_map(spark, rows):
    out = skos_audit(build(spark, rows)).collect()
    return {(r.concept, r.issue) for r in out}


def test_cycle_and_orphan_and_clean(spark):
    b = SKOS + "broader"
    rows = [
        iri("urn:k:a", RDF_TYPE, SKOS + "Concept"),
        iri("urn:k:b", RDF_TYPE, SKOS + "Concept"),
        iri("urn:k:c", RDF_TYPE, SKOS + "Concept"),
        iri("urn:k:lone", RDF_TYPE, SKOS + "Concept"),
        iri("urn:k:a", b, "urn:k:b"),
        iri("urn:k:b", b, "urn:k:c"),
        iri("urn:k:c", b, "urn:k:a"),  # 3-cycle
        iri("urn:k:ok", b, "urn:k:c"),
    ]
    got = audit_map(spark, rows)
    assert ("urn:k:a", "broader_cycle") in got
    assert ("urn:k:b", "broader_cycle") in got
    assert ("urn:k:c", "broader_cycle") in got
    assert ("urn:k:lone", "orphan") in got
    assert not any(c == "urn:k:ok" for (c, _i) in got)


def test_narrower_is_inverse_for_cycles(spark):
    rows = [
        iri("urn:k:x", SKOS + "broader", "urn:k:y"),
        # narrower(x, y) means broader(y, x) -> closes the 2-cycle
        iri("urn:k:x", SKOS + "narrower", "urn:k:y"),
    ]
    got = audit_map(spark, rows)
    assert ("urn:k:x", "broader_cycle") in got and ("urn:k:y", "broader_cycle") in got


def test_label_issues(spark):
    p, a = SKOS + "prefLabel", SKOS + "altLabel"
    rows = [
        lab("urn:k:m", p, "Alpha"), lab("urn:k:m", p, "Beta"),        # S14 en
        lab("urn:k:m", p, "Alpha", lang="de"),                        # fine
        lab("urn:k:n", p, "Gamma"), lab("urn:k:n", a, "Gamma"),       # S13 clash
        lab("urn:k:n", a, "Gamma", lang="fr"),                        # fine (lang differs)
        lab("urn:k:o", p, "Same"), lab("urn:k:o", p, "Same"),         # duplicate triple, 1 distinct
    ]
    got = audit_map(spark, rows)
    assert ("urn:k:m", "multiple_pref_label") in got
    assert ("urn:k:n", "label_clash") in got
    assert not any(c == "urn:k:o" for (c, _i) in got)


def test_top_with_broader(spark):
    rows = [
        iri("urn:k:t", SKOS + "topConceptOf", "urn:k:scheme"),
        iri("urn:k:t", SKOS + "broader", "urn:k:up"),
        iri("urn:k:scheme", SKOS + "hasTopConcept", "urn:k:t2"),
        iri("urn:k:t3", SKOS + "topConceptOf", "urn:k:scheme"),  # clean top
    ]
    got = audit_map(spark, rows)
    assert ("urn:k:t", "top_with_broader") in got
    assert not any(c in ("urn:k:t2", "urn:k:t3") and i == "top_with_broader" for (c, i) in got)
