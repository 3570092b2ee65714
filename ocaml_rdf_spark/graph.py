"""Graph API — the reference's storage-engine surface (rdf_graph.ml,
SURVEY §2.1) over an immutable quad DataFrame.

Where the reference mutates an in-memory/SQL store triple-at-a-time, this
is a functional facade: every mutator returns a NEW Graph wrapping a new
DataFrame (Spark-idiomatic; Iceberg snapshot commits give the transactional
behavior at the sink — see pipeline.py). Pattern probes compile to pushed
filters; on the SPO/POS-sorted materializations (store.py) they prune files
the way the reference's nested maps prune keys.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .types import DEFAULT_GRAPH, KIND_BNODE, KIND_IRI, KIND_LITERAL, TRIPLE_KEY, TRIPLES_COLUMNS, BNode, Iri, Literal, Term, term_kind, triple_row


def _term_filter(prefix: str, t: Term) -> list[Column]:
    """Equality predicates for one bound position — these push down to the
    parquet scan (PushedFilters), giving rdf_mem.ml's map-lookup behavior."""
    k = term_kind(t)
    if prefix == "pred":
        return [F.col("pred") == t.value]
    kcol, lcol = f"{prefix}_kind", f"{prefix}_lex"
    if k == KIND_IRI:
        return [F.col(kcol) == KIND_IRI, F.col(lcol) == t.value]
    if k == KIND_BNODE:
        return [F.col(kcol) == KIND_BNODE, F.col(lcol) == t.label]
    conds = [F.col(kcol) == KIND_LITERAL, F.col(lcol) == t.lexical]
    if t.lang:
        conds.append(F.col("o_lang") == t.lang)
    else:
        from .types import XSD_STRING

        conds.append(F.col("o_dtype") == (t.dtype or XSD_STRING))
    return conds


class Graph:
    """A named graph slice of the quad store (rdf_graph.ml :: open_graph)."""

    def __init__(self, df: DataFrame, name: str = DEFAULT_GRAPH, namespaces: Optional[dict] = None):
        self.df = df
        self.name = name
        self.namespaces = dict(namespaces or {})

    # -- constructors --------------------------------------------------------

    @classmethod
    def empty(cls, spark, name: str = DEFAULT_GRAPH) -> "Graph":
        from .types import TRIPLES_SCHEMA

        return cls(spark.createDataFrame([], schema=TRIPLES_SCHEMA), name)

    @classmethod
    def from_triples(cls, spark, triples, name: str = DEFAULT_GRAPH) -> "Graph":
        """triples: iterable of (s, p, o) Terms — driver-side, small data
        (test fixtures / VALUES blocks); big data arrives via extract.py."""
        rows = [triple_row(s, p, o, graph=name) for s, p, o in triples]
        from .types import TRIPLES_SCHEMA

        return cls(spark.createDataFrame(rows, schema=TRIPLES_SCHEMA), name)

    # -- mutators (functional; rdf_graph.ml :: add_triple / rem_triple) ------

    def add_triple(self, s: Term, p: Iri, o: Term) -> "Graph":
        spark = self.df.sparkSession
        from .types import TRIPLES_SCHEMA

        new = spark.createDataFrame([triple_row(s, p, o, graph=self.name)], schema=TRIPLES_SCHEMA)
        return Graph(self.df.unionByName(new).dropDuplicates(TRIPLE_KEY), self.name, self.namespaces)

    def add_triples_df(self, other: DataFrame) -> "Graph":
        """Bulk insert with set semantics (dup insert is a no-op)."""
        return Graph(self.df.unionByName(other).dropDuplicates(TRIPLE_KEY), self.name, self.namespaces)

    def rem_triple(self, s: Term, p: Iri, o: Term) -> "Graph":
        """Delete exactly the matching triple (rdf_graph.ml :: rem_triple).

        The match condition uses eqNullSafe on EVERY key component: o_dtype /
        o_lang are nullable, so a plain `==` disjunct chain evaluates to NULL
        on a non-matching sibling row (e.g. removing "x"@en while "x"^^xsd:
        string shares s/p/lex) and filter() would drop that sibling too.
        Null-safe equality makes the negation total."""
        row = triple_row(s, p, o, graph=self.name)
        keys = ["s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang"]
        match = F.lit(True)
        for k, v in zip(keys, row[: len(keys)]):
            match = match & F.col(k).eqNullSafe(F.lit(v))
        return Graph(self.df.filter(~match), self.name, self.namespaces)

    # -- probes (rdf_graph.ml :: find / exists / *_of) ------------------------

    def find(self, sub: Optional[Term] = None, pred: Optional[Iri] = None, obj: Optional[Term] = None) -> DataFrame:
        """Pattern match with any subset of positions bound; equality
        predicates push to the scan (SPO copy serves S-bound probes, POS
        copy serves P/O-bound — SURVEY §3 EP3)."""
        df = self.df
        for p_, t in (("s", sub), ("pred", pred), ("o", obj)):
            if t is not None:
                for c in _term_filter(p_, t):
                    df = df.filter(c)
        return df

    def exists(self, sub=None, pred=None, obj=None) -> bool:
        return self.find(sub, pred, obj).limit(1).count() > 0

    def subjects_of(self, pred: Iri, obj: Term) -> DataFrame:
        return self.find(pred=pred, obj=obj).select("s_kind", "s_lex").distinct()

    def objects_of(self, sub: Term, pred: Iri) -> DataFrame:
        return self.find(sub=sub, pred=pred).select("o_kind", "o_lex", "o_dtype", "o_lang").distinct()

    def predicates_of(self, sub: Term, obj: Term) -> DataFrame:
        return self.find(sub=sub, obj=obj).select("pred").distinct()

    def subjects(self) -> DataFrame:
        return self.df.select("s_kind", "s_lex").distinct()

    def predicates(self) -> DataFrame:
        return self.df.select("pred").distinct()

    def objects(self) -> DataFrame:
        return self.df.select("o_kind", "o_lex", "o_dtype", "o_lang").distinct()

    def size(self) -> int:
        return self.df.count()

    # -- namespaces (rdf_graph.ml :: add_namespace) ---------------------------

    def add_namespace(self, prefix: str, iri: str) -> "Graph":
        ns = dict(self.namespaces)
        ns[prefix] = iri
        return Graph(self.df, self.name, ns)


class Dataset:
    """Default graph + named graphs over one quad DataFrame (rdf_ds.ml)."""

    def __init__(self, df: DataFrame, default_graph: str = DEFAULT_GRAPH):
        self.df = df
        self.default_graph = default_graph

    def graph(self, name: Optional[str] = None) -> Graph:
        g = name or self.default_graph
        return Graph(self.df.filter(F.col("graph") == g), g)

    def default(self) -> Graph:
        return self.graph(self.default_graph)

    def graph_names(self) -> DataFrame:
        return self.df.select("graph").distinct()

    def union_all_graphs(self) -> Graph:
        """The RDF merge of all named graphs (used when querying without
        GRAPH); blank ids are already graph-scoped by construction."""
        return Graph(self.df, self.default_graph)
