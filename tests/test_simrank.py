"""SimRank (operators/cc.py::simrank) — hand-checked values on the
Jeh & Widom (KDD 2002) university example plus in-degree normalization."""

from ocaml_rdf_spark.operators.cc import simrank


def pairs(df):
    return {(r.a, r.b): r.sim for r in df.collect()}


def test_university_example(spark):
    e = spark.createDataFrame(
        [("Univ", "ProfA"), ("Univ", "ProfB"),
         ("ProfA", "StudentA"), ("ProfB", "StudentB"),
         ("StudentA", "Univ"), ("StudentB", "Univ")],
        "src string, dst string",
    )
    # round 1: only (ProfA, ProfB) lights up (shared in-neighbor Univ)
    got1 = pairs(simrank(e, iters=1, c_pct=80))
    assert got1 == {("ProfA", "ProfB"): 800_000}
    # round 2: students inherit 0.8 * s1(ProfA, ProfB) = 640000
    got2 = pairs(simrank(e, iters=2, c_pct=80))
    assert got2 == {("ProfA", "ProfB"): 800_000,
                    ("StudentA", "StudentB"): 640_000}


def test_indegree_normalization(spark):
    # I(a) = {x, y}, I(b) = {x, z}: one matching pair out of 4 ->
    # 0.8 * 1e6 // 4 = 200000
    e = spark.createDataFrame(
        [("x", "a"), ("y", "a"), ("x", "b"), ("z", "b")],
        "src string, dst string",
    )
    got = pairs(simrank(e, iters=1, c_pct=80))
    assert got == {("a", "b"): 200_000}


def test_no_shared_context_is_sparse(spark):
    e = spark.createDataFrame(
        [("p", "a"), ("q", "b")], "src string, dst string",
    )
    assert pairs(simrank(e, iters=3, c_pct=80)) == {}
