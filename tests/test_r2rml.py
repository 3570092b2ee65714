"""R2RML-lite executor (operators/directmap.py::r2rml_map).

Reference has no relational ingestion (SURVEY §2.1: rdf_my.ml /
rdf_postgresql.ml are storage backends; /root/reference empty per §0);
cases below pin the implemented subset of the W3C R2RML Recommendation:
subject templates with IRI-safe escaping, column/template/constant object
maps with datatype & language, NULL suppression, and referencing object
maps (parent triples map + join condition), including a same-named join
column that would be ambiguous without qualified resolution.
"""

import pytest

from ocaml_rdf_spark.operators.directmap import ObjectMap, TriplesMap, r2rml_map


@pytest.fixture(scope="module")
def tables(spark):
    dept = spark.createDataFrame(
        [(10, "R&D", "paris"), (20, "Sales / EU", None)],
        "deptno int, dname string, city string",
    )
    emp = spark.createDataFrame(
        [(1, "alice", 10, 4200.5), (2, "bob", 20, None), (3, None, 10, 1000.0)],
        "empno int, ename string, deptno int, sal double",
    )
    return {"dept": dept, "emp": emp}


DEPT_MAP = TriplesMap(
    name="DeptMap",
    table="dept",
    subject_template="urn:x:dept/{deptno}",
    subject_class="urn:x:Department",
    object_maps=(
        ObjectMap(pred="urn:p:dname", column="dname"),
        ObjectMap(pred="urn:p:city", column="city", language="en"),
    ),
)

EMP_MAP = TriplesMap(
    name="EmpMap",
    table="emp",
    subject_template="urn:x:emp/{empno}",
    object_maps=(
        ObjectMap(pred="urn:p:label", template="{ename} ({empno})",
                  term_type="literal"),
        ObjectMap(pred="urn:p:homepage", template="http://ex.org/e/{ename}"),
        ObjectMap(pred="urn:p:sal", column="sal"),
        ObjectMap(pred="urn:p:kind", constant="worker", term_type="literal",
                  language="en"),
        ObjectMap(pred="urn:p:dept", parent=("DeptMap", [("deptno", "deptno")])),
    ),
)


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_subject_class_and_columns(spark, tables):
    out = rows(r2rml_map(tables, [DEPT_MAP]))
    assert ("urn:x:dept/10", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            0, "urn:x:Department", None, None) in out
    # natural datatype from column type; IRI-safe escaping NOT applied to
    # literal column values
    assert ("urn:x:dept/20", "urn:p:dname", 2, "Sales / EU",
            "http://www.w3.org/2001/XMLSchema#string", None) in out
    # language-tagged → no datatype
    assert ("urn:x:dept/10", "urn:p:city", 2, "paris", None, "en") in out
    # NULL column suppressed
    assert not any(s == "urn:x:dept/20" and p == "urn:p:city" for (s, p, *_r) in out)


def test_templates_constants_and_ref(spark, tables):
    out = rows(r2rml_map(tables, [DEPT_MAP, EMP_MAP]))
    # literal template: raw values, both placeholders expanded
    assert ("urn:x:emp/1", "urn:p:label", 2, "alice (1)",
            "http://www.w3.org/2001/XMLSchema#string", None) in out
    # IRI template over a string column
    assert ("urn:x:emp/2", "urn:p:homepage", 0, "http://ex.org/e/bob",
            None, None) in out
    # NULL in any template placeholder suppresses the whole arc
    assert not any(s == "urn:x:emp/3" and p in ("urn:p:label", "urn:p:homepage")
                   for (s, p, *_r) in out)
    # constant literal with language
    assert ("urn:x:emp/3", "urn:p:kind", 2, "worker", None, "en") in out
    # double column → xsd:double natural datatype; NULL suppressed for bob
    assert ("urn:x:emp/1", "urn:p:sal", 2, "4200.5",
            "http://www.w3.org/2001/XMLSchema#double", None) in out
    assert not any(s == "urn:x:emp/2" and p == "urn:p:sal" for (s, p, *_r) in out)
    # referencing object map joins on the SAME column name in both tables
    # (qualified resolution) and emits the parent subject IRI
    assert ("urn:x:emp/1", "urn:p:dept", 0, "urn:x:dept/10", None, None) in out
    assert ("urn:x:emp/3", "urn:p:dept", 0, "urn:x:dept/10", None, None) in out


def test_iri_safe_escaping_in_subject(spark, tables):
    tm = TriplesMap(
        name="D2", table="dept", subject_template="urn:x:d/{dname}",
        subject_class="urn:x:D",
    )
    out = rows(r2rml_map(tables, [tm]))
    assert ("urn:x:d/Sales%20%2F%20EU",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            0, "urn:x:D", None, None) in out


def test_errors(spark, tables):
    with pytest.raises(KeyError):
        r2rml_map(tables, [TriplesMap(name="B", table="dept",
                                      subject_template="urn:x:{nope}")])
    with pytest.raises(ValueError):
        r2rml_map(tables, [TriplesMap(
            name="B", table="dept", subject_template="urn:x:d/{deptno}",
            object_maps=(ObjectMap(pred="urn:p:x", column="dname",
                                   constant="y"),),
        )])
    with pytest.raises(KeyError):
        r2rml_map(tables, [TriplesMap(
            name="B", table="dept", subject_template="urn:x:d/{deptno}",
            object_maps=(ObjectMap(pred="urn:p:x",
                                   parent=("Missing", [("deptno", "deptno")])),),
        )])
