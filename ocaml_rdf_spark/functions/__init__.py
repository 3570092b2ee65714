"""SPARQL expression layer: value lattice (rdf_dt.ml), effective boolean
value, the spec total order, and the §17 builtin library (rdf_sparql_eval.ml
:: iri_funs) — all as Catalyst Column builders, no Python UDFs."""

from .terms import *  # noqa: F401,F403
from .builtins import *  # noqa: F401,F403
