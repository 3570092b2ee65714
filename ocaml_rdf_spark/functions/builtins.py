"""SPARQL §17 builtin functions + operators as a composable expression DSL.

Parity: rdf_sparql_eval.ml's builtin dispatch + rdf_dt.ml coercions
(SURVEY §2.8). An expression is an `E` node; `E(varmap) -> Column` yields a
TERM_STRUCT Column. Errors are NULL structs (R4 deviation table in
SURVEY §2.8): FILTER drops them (NULL is not true), BIND leaves the var
unbound — matching the spec's error-propagation outcomes.

Everything compiles to built-in Catalyst expressions (when/try_cast/
string fns/hashes) — whole-stage-codegen friendly, zero Python UDFs.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..types import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    XSD_BOOLEAN,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    Term,
)
from ..types import Iri as PyIri
from ..types import Literal as PyLiteral
from .terms import (
    boolv,
    ebv,
    is_blank,
    is_iri,
    is_literal,
    is_numeric_dtype,
    is_stringish,
    mk_term,
    null_term,
    num,
    sort_key,
    t_bnode,
    t_bool,
    t_double,
    t_int,
    t_iri,
    t_lang,
    t_string,
    t_typed,
    term_lit,
    ts,
)

def _nullb():
    return F.lit(None).cast("boolean")

VarMap = dict  # var name -> term-struct Column


class E:
    """Expression node: callable varmap → term-struct Column.

    Boolean-producing nodes also carry `bfn`, the RAW boolean Column
    builder (the argument `t_bool` would wrap). Since t_bool maps
    NULL→null_term and ebv maps a valid xsd:boolean term back to its
    value (NULL for null_term), `ebv(t_bool(c)) ≡ c` exactly — so every
    EBV consumer (FILTER, &&/||/!, IF, join conditions) reads `bfn`
    instead of re-deriving EBV from the term struct. Without this,
    each ebv() wrap re-embeds its operand tree ~8× (one per CASE
    branch), and nested boolean combinators grow the Catalyst
    expression multiplicatively: one FILTER(EXISTS(..) || ?x = "k")
    condition cost 6 s of analyzer time at plan-build (measured);
    with bfn the comparison kernel appears once."""

    __slots__ = ("fn", "bfn", "_has_agg", "_agg_spec")

    def __init__(self, fn: Callable[[VarMap], Column], bfn: Optional[Callable[[VarMap], Column]] = None):
        self.fn = fn
        self.bfn = bfn

    def __call__(self, vm: VarMap) -> Column:
        return self.fn(vm)

    # comparisons (value semantics, §17.4.1.7-9)
    def __eq__(self, other):  # type: ignore[override]
        return _cmp(self, _e(other), eq_bool)

    def __ne__(self, other):  # type: ignore[override]
        return _cmp(self, _e(other), lambda a, b: _not3(eq_bool(a, b)))

    def __lt__(self, other):
        return _cmp(self, _e(other), lt_bool)

    def __gt__(self, other):
        return _cmp(self, _e(other), lambda a, b: lt_bool(b, a))

    def __le__(self, other):
        return _cmp(self, _e(other), lambda a, b: _or3(lt_bool(a, b), eq_bool(a, b)))

    def __ge__(self, other):
        return _cmp(self, _e(other), lambda a, b: _or3(lt_bool(b, a), eq_bool(a, b)))

    # logical (SPARQL 3VL, §17.4.1.5-6 — aligns with SQL 3VL on these tables)
    def __and__(self, other):
        o = _e(other)
        return bool_e(lambda vm: ebv_e(self, vm) & ebv_e(o, vm))

    def __or__(self, other):
        o = _e(other)
        return bool_e(lambda vm: ebv_e(self, vm) | ebv_e(o, vm))

    def __invert__(self):
        return bool_e(lambda vm: ~ebv_e(self, vm))

    # arithmetic (§17.4.1 operator mappings over the numeric tower)
    def __add__(self, other):
        return _arith(self, _e(other), lambda a, b: a + b, dec_op=F.try_add)

    def __sub__(self, other):
        return _arith(self, _e(other), lambda a, b: a - b, dec_op=F.try_subtract)

    def __mul__(self, other):
        return _arith(self, _e(other), lambda a, b: a * b, dec_op=F.try_multiply)

    def __truediv__(self, other):
        # xsd divide: integer/integer -> decimal (never int division)
        return _arith(self, _e(other), lambda a, b: a / F.nullif(b, F.lit(0.0)), force_double=True)

    def __hash__(self):
        return id(self)


def _e(x) -> E:
    if isinstance(x, E):
        return x
    return L(x)


def V(name: str) -> E:
    """Variable reference. A variable with NO binding in scope evaluates
    to the error value (§17.2 — an expression error, not a compile
    failure): COALESCE(?never_bound) must catch it, and BIND of it must
    leave the target unbound."""
    return E(lambda vm: vm[name] if name in vm else null_term())


class _VarProbe(dict):
    """Recording varmap: collects every variable name an expression looks
    up. V() resolves through `in` (then `[]`) and BOUND through `[]`, so
    both paths are observed; lookups answer "unbound" / null_term so the
    probed expression still builds."""

    def __init__(self):
        super().__init__()
        self.seen: set = set()

    def __contains__(self, k):
        self.seen.add(k)
        return False

    def __getitem__(self, k):
        self.seen.add(k)
        return null_term()

    def get(self, k, default=None):
        self.seen.add(k)
        return default


def expr_vars(e: E):
    """Variable names referenced by an (opaque, lambda-based) expression,
    discovered by probing it with a recording varmap — the introspection
    EXISTS substitution semantics needs to tell correlated sub-pattern
    filters from local ones (algebra.ExistsFilter/ExistsMark). Returns a
    frozenset, or None if probing fails (callers must fall back to
    treating the expression as local — the pre-probe behavior).

    Requires an active SparkSession (probing builds throwaway Columns),
    which every compile-time caller has."""
    p = _VarProbe()
    try:
        e.fn(p)
    except Exception:
        return None
    return frozenset(p.seen)


def L(value) -> E:
    """Constant: Python value or Term → literal/IRI term. Column
    construction is deferred to compile time (lambda body) so queries can
    be PARSED without an active SparkContext."""
    if isinstance(value, Term.__args__):  # type: ignore[attr-defined]
        t = value
    elif isinstance(value, bool):
        t = PyLiteral("true" if value else "false", dtype=XSD_BOOLEAN)
    elif isinstance(value, int):
        t = PyLiteral(str(value), dtype=XSD_INTEGER)
    elif isinstance(value, float):
        t = PyLiteral(repr(value), dtype=XSD_DOUBLE)
    elif isinstance(value, str):
        t = PyLiteral(value)
    else:
        raise TypeError(f"cannot lift {value!r}")
    return E(lambda vm, t=t: term_lit(t))


def IRI_(value: str) -> E:
    return E(lambda vm, t=PyIri(value): term_lit(t))


# ---------------------------------------------------------------------------
# comparison kernels
# ---------------------------------------------------------------------------


def bool_e(raw: Callable[[VarMap], Column]) -> E:
    """E for a boolean-valued expression: term form is t_bool(raw), and
    `bfn` exposes raw for EBV consumers (ebv(t_bool(c)) ≡ c)."""
    return E(lambda vm: t_bool(raw(vm)), raw)


def ebv_e(e: E, vm: VarMap) -> Column:
    """EBV of an expression — the raw boolean when the node carries one
    (no term-struct round trip, no tree duplication), §17.2.2 otherwise."""
    b = getattr(e, "bfn", None)
    return b(vm) if b is not None else ebv(e(vm))


def _not3(c: Column) -> Column:
    return F.when(c.isNull(), _nullb()).otherwise(~c)


def _or3(a: Column, b: Column) -> Column:
    return a | b


def eq_bool(a: Column, b: Column) -> Column:
    """SPARQL `=`: numeric/boolean/dateTime by value, strings by lex+lang,
    IRI/bnode by identity, unknown datatypes: equal lex ⇒ true, else error."""
    return (
        F.when(a.isNull() | b.isNull(), _nullb())
        .when(is_numeric_dtype(a) & is_numeric_dtype(b), num(a) == num(b))
        .when(
            (a["kind"] != KIND_LITERAL) | (b["kind"] != KIND_LITERAL),
            (a["kind"] == b["kind"]) & (a["lex"] == b["lex"]),
        )
        .when((a["dtype"] == XSD_BOOLEAN) & (b["dtype"] == XSD_BOOLEAN), boolv(a) == boolv(b))
        .when((a["dtype"] == XSD_DATETIME) & (b["dtype"] == XSD_DATETIME), ts(a) == ts(b))
        .when(is_stringish(a) & is_stringish(b), (a["lex"] == b["lex"]) & a["lang"].eqNullSafe(b["lang"]))
        .when(
            a["dtype"] == b["dtype"],
            F.when(a["lex"] == b["lex"], F.lit(True)).otherwise(_nullb()),
        )
        .otherwise(F.lit(False))
    )


def lt_bool(a: Column, b: Column) -> Column:
    """SPARQL `<`: defined for numeric, simple/xsd strings, booleans,
    dateTimes; anything else is a type error (NULL)."""
    return (
        F.when(a.isNull() | b.isNull(), _nullb())
        .when(is_numeric_dtype(a) & is_numeric_dtype(b), num(a) < num(b))
        .when(
            is_stringish(a) & a["lang"].isNull() & is_stringish(b) & b["lang"].isNull(),
            a["lex"] < b["lex"],
        )
        .when((a["dtype"] == XSD_BOOLEAN) & (b["dtype"] == XSD_BOOLEAN), boolv(a) < boolv(b))
        .when((a["dtype"] == XSD_DATETIME) & (b["dtype"] == XSD_DATETIME), ts(a) < ts(b))
        .otherwise(_nullb())
    )


def _cmp(a: E, b: E, kernel) -> E:
    return bool_e(lambda vm: kernel(a(vm), b(vm)))


def _arith(a: E, b: E, op, force_double: bool = False, dec_op=None) -> E:
    def fn(vm):
        from .terms import EXACT_DTYPES, dec, t_decimal, t_int_exact

        av, bv = a(vm), b(vm)
        r = op(num(av), num(bv))
        both_int = (av["dtype"] == XSD_INTEGER) & (bv["dtype"] == XSD_INTEGER)
        if force_double:
            # xsd:decimal result (integer ÷ integer → decimal, §17.4.1);
            # canonical lexical form: integral values print without ".0"
            # (XSD 1.1 decimalCanonicalMap), same rule as _num1
            r2 = r.cast("double")
            lex = F.when(r2 == r2.cast("long").cast("double"), r2.cast("long").cast("string")).otherwise(
                r2.cast("string")
            )
            return t_typed(lex, XSD_DECIMAL)
        # exact tier (§17.4.1 operator mapping: integer op integer →
        # integer, decimal op decimal → decimal — rdf_dt.ml keeps these
        # exact): +,-,* between integer/decimal literals stay in decimal
        # arithmetic, so 2^53+1 + 2 doesn't drift through double
        da, db = dec(av), dec(bv)
        both_exact = (
            av["dtype"].isin(*EXACT_DTYPES)
            & bv["dtype"].isin(*EXACT_DTYPES)
            & da.isNotNull()
            & db.isNotNull()
        )
        # try_add/try_subtract/try_multiply: decimal(38,6) overflow yields
        # NULL (plain ops THROW under ANSI, killing the job); a NULL exact
        # result demotes to the double tier — an approximation, like the
        # reference's float promotion, never a fatal error
        dr = (dec_op or op)(da, db)
        return (
            F.when(both_int & dr.isNotNull(), t_int_exact(dr))
            .when(both_exact & dr.isNotNull(), t_decimal(dr))
            .otherwise(t_double(r))
        )

    return E(fn)


# ---------------------------------------------------------------------------
# §17.4 builtins
# ---------------------------------------------------------------------------


def BOUND(v: str) -> E:
    return bool_e(lambda vm: vm[v].isNotNull())


def EXISTS_MARK(col_name: str) -> E:
    """Reference to an algebra.ExistsMark flag column — the decorrelated
    form of EXISTS used inside expressions (spec §17.4.1.4)."""
    return bool_e(lambda vm: F.col(col_name))


def IF(c: E, t: E, e: E) -> E:
    """§17.4.1.2: an ERROR condition makes the whole IF an error (it must
    NOT fall through to the else branch), so the error case is pinned to
    null_term via a double-sided when."""

    def fn(vm):
        b = ebv_e(c, vm)
        return F.when(b, t(vm)).when(~b, e(vm)).otherwise(null_term())

    return E(fn)


def COALESCE(*args: E) -> E:
    return E(lambda vm: F.coalesce(*[a(vm) for a in args]))


def SAME_TERM(a: E, b: E) -> E:
    return bool_e(lambda vm: a(vm).eqNullSafe(b(vm)) & a(vm).isNotNull() & b(vm).isNotNull())


def IN(x: E, *opts: E) -> E:
    # §17.3.1: IN ≡ (x = e1) || (x = e2) || … under Kleene 3VL OR — an
    # erroring comparison is tolerated when another branch is TRUE, but
    # poisons a would-be-false result (error, not false). NOT IN (¬ of
    # this, §17.3.2) therefore DROPS rows whose membership test errored;
    # the old coalesce-to-false form wrongly kept them.
    def fn(vm):
        c = F.lit(False)
        for o in opts:
            c = _or3(c, eq_bool(x(vm), o(vm)))
        return F.when(x(vm).isNull(), _nullb()).otherwise(c)

    return bool_e(fn)


def IS_IRI(x: E) -> E:
    return bool_e(lambda vm: F.when(x(vm).isNull(), _nullb()).otherwise(is_iri(x(vm))))


def IS_BLANK(x: E) -> E:
    return bool_e(lambda vm: F.when(x(vm).isNull(), _nullb()).otherwise(is_blank(x(vm))))


def IS_LITERAL(x: E) -> E:
    return bool_e(lambda vm: F.when(x(vm).isNull(), _nullb()).otherwise(is_literal(x(vm))))


def IS_NUMERIC(x: E) -> E:
    return bool_e(lambda vm: F.when(x(vm).isNull(), _nullb()).otherwise(num(x(vm)).isNotNull()))


# SPARQL-star functions (§ RDF-star CG report; beyond the reference)


def IS_TRIPLE(x: E) -> E:
    from .terms import is_triple

    return bool_e(lambda vm: is_triple(x(vm)))


def TRIPLE_FN(s: E, p: E, o: E) -> E:
    from .terms import t_quoted

    return E(lambda vm: t_quoted(s(vm), p(vm), o(vm)))


def SUBJECT(x: E) -> E:
    from .terms import qt_component

    return E(lambda vm: qt_component(x(vm), 1))


def PREDICATE(x: E) -> E:
    from .terms import qt_component

    return E(lambda vm: qt_component(x(vm), 2))


def OBJECT(x: E) -> E:
    from .terms import qt_component

    return E(lambda vm: qt_component(x(vm), 3))


def STR(x: E) -> E:
    def fn(vm):
        v = x(vm)
        return F.when(v.isNull() | is_blank(v), null_term()).otherwise(t_string(v["lex"]))

    return E(fn)


def LANG(x: E) -> E:
    def fn(vm):
        v = x(vm)
        return F.when(v.isNull() | ~is_literal(v), null_term()).otherwise(t_string(F.coalesce(v["lang"], F.lit(""))))

    return E(fn)


def DATATYPE(x: E) -> E:
    def fn(vm):
        v = x(vm)
        return F.when(v.isNull() | ~is_literal(v), null_term()).otherwise(
            t_iri(F.coalesce(v["dtype"], F.when(v["lang"].isNotNull(), RDF_LANGSTRING).otherwise(XSD_STRING)))
        )

    return E(fn)


def IRI(x: E, base: str | None = None) -> E:
    def fn(vm):
        v = x(vm)
        lex = v["lex"]
        resolved = lex if base is None else F.when(lex.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lex).otherwise(
            F.concat(F.lit(base), lex)
        )
        return F.when(v.isNull() | is_blank(v), null_term()).otherwise(t_iri(resolved))

    return E(fn)


def BNODE(x: E | None = None) -> E:
    """Deterministic hash-derived bnode (documented deviation from
    fresh-per-call, SURVEY §2.8: counters don't distribute)."""

    def fn(vm):
        # §17.4.2.9: the SAME label maps to the same bnode WITHIN a
        # solution but to DISTINCT bnodes across solutions — so the seed
        # always mixes in the solution's bindings; the label argument
        # only differentiates bnodes inside one solution. Bnode-valued
        # bindings are EXCLUDED from the seed: a previously-BOUND
        # BNODE() output would otherwise make the second BNODE("k") in
        # the same solution disagree with the first (documented
        # deviation: solutions distinguished ONLY by blank-node bindings
        # share BNODE outputs).
        row = F.concat_ws(
            "\x1f",
            *[
                # NULL (not "") so concat_ws drops the component entirely
                # and the pre-/post-BIND varmaps produce the same seed
                F.when(c["kind"] == KIND_BNODE, F.lit(None).cast("string")).otherwise(
                    F.coalesce(c["lex"], F.lit(""))
                )
                for c in vm.values()
            ],
        )
        if x is None:
            seed = row
        else:
            seed = F.when(x(vm).isNull(), F.lit(None)).otherwise(
                F.concat_ws("\x1e", x(vm)["lex"], row)
            )
        return t_bnode(F.substring(F.sha1(seed.cast("string")), 1, 16))

    return E(fn)


def STRDT(x: E, dt: str) -> E:
    return E(lambda vm: t_typed(x(vm)["lex"], dt))


def STRLANG(x: E, lang_tag: str) -> E:
    return E(lambda vm: t_lang(x(vm)["lex"], F.lit(lang_tag)))


def UUID() -> E:
    return E(lambda vm: t_iri(F.concat(F.lit("urn:uuid:"), F.expr("uuid()"))))


def STRUUID() -> E:
    return E(lambda vm: t_string(F.expr("uuid()")))


def _str1(x: E, col_fn, keep_tag: bool = True) -> E:
    """String op preserving the lang/dtype of the first argument (§17.4.3)."""

    def fn(vm):
        v = x(vm)
        r = col_fn(v["lex"])
        if keep_tag:
            out = F.when(v["lang"].isNotNull(), t_lang(r, v["lang"])).otherwise(t_string(r))
        else:
            out = t_string(r)
        return F.when(v.isNull() | ~is_stringish(v), null_term()).otherwise(out)

    return E(fn)


def STRLEN(x: E) -> E:
    return E(lambda vm: F.when(x(vm).isNull() | ~is_stringish(x(vm)), null_term()).otherwise(t_int(F.length(x(vm)["lex"]))))


def SUBSTR(x: E, start: int, length: int | None = None) -> E:
    """XPath fn:substring bounds (§17.4.3.3): keep 1-based positions p
    with round(start) <= p < round(start) + round(length). start <= 0
    therefore CLIPS — SUBSTR("Alice", 0, 2) = "A" — it must not fall
    through to Spark's substring, which reads a negative start as
    from-the-end and start 0 as 1 without shortening the window."""
    s_eff = max(start, 1)
    if length is None:
        return _str1(x, lambda c: F.substring(c, s_eff, 2**31 - 1))
    l_eff = start + length - s_eff
    if l_eff <= 0:
        return _str1(x, lambda c: F.lit(""))
    return _str1(x, lambda c: F.substring(c, s_eff, l_eff))


def UCASE(x: E) -> E:
    return _str1(x, F.upper)


def LCASE(x: E) -> E:
    return _str1(x, F.lower)


def _str_compat(a: Column, b: Column) -> Column:
    """§17.4.3 argument-compatibility rules for the two-string builtins:
    both simple/xsd:string; or arg1 lang-tagged with arg2 simple/
    xsd:string; or both lang-tagged with EQUAL tags. Anything else
    (including "abc"@en vs "b"@cy) is an error."""
    return (
        is_stringish(a)
        & is_stringish(b)
        & ((b["dtype"] == XSD_STRING) | a["lang"].eqNullSafe(b["lang"]))
    )


def _str2_bool(x: E, y: E, kernel) -> E:
    def fn(vm):
        a, b = x(vm), y(vm)
        return F.when(a.isNull() | b.isNull() | ~_str_compat(a, b), _nullb()).otherwise(
            kernel(a["lex"], b["lex"])
        )

    return bool_e(fn)


def STRSTARTS(x: E, y: E) -> E:
    return _str2_bool(x, _e(y), lambda a, b: a.startswith(b))


def STRENDS(x: E, y: E) -> E:
    return _str2_bool(x, _e(y), lambda a, b: a.endswith(b))


def CONTAINS(x: E, y: E) -> E:
    return _str2_bool(x, _e(y), lambda a, b: a.contains(b))


def STRBEFORE(x: E, y: E) -> E:
    # §17.4.3.12: on a MATCH (incl. empty pattern) the result carries the
    # first argument's lang tag / datatype ("abc"@en,"b" → "a"@en); on no
    # match the result is the simple literal "" (no tag); incompatible
    # arguments are an error.
    y = _e(y)

    def fn(vm):
        a, b = x(vm), y(vm)
        al, bl = a["lex"], b["lex"]
        pos = F.instr(al, bl)
        matched = (bl == "") | (pos > 0)
        r = F.when(bl == "", F.lit("")).otherwise(F.substring(al, F.lit(1), pos - 1))
        carried = mk_term(F.lit(KIND_LITERAL), r, a["dtype"], a["lang"])
        return (
            F.when(a.isNull() | b.isNull() | ~_str_compat(a, b), null_term())
            .when(matched, carried)
            .otherwise(t_string(F.lit("")))
        )

    return E(fn)


def STRAFTER(x: E, y: E) -> E:
    y = _e(y)

    def fn(vm):
        a, b = x(vm), y(vm)
        al, bl = a["lex"], b["lex"]
        pos = F.instr(al, bl)
        matched = (bl == "") | (pos > 0)
        r = F.when(bl == "", al).otherwise(
            F.substring(al, pos + F.length(bl), F.lit(2**31 - 1))
        )
        carried = mk_term(F.lit(KIND_LITERAL), r, a["dtype"], a["lang"])
        return (
            F.when(a.isNull() | b.isNull() | ~_str_compat(a, b), null_term())
            .when(matched, carried)
            .otherwise(t_string(F.lit("")))
        )

    return E(fn)


def ENCODE_FOR_URI(x: E) -> E:
    # url_encode gives application/x-www-form-urlencoded (space → '+');
    # SPARQL wants %20 — patch the delta (SURVEY §2.8)
    return _str1(x, lambda c: F.replace(F.url_encode(c), F.lit("+"), F.lit("%20")), keep_tag=False)


def CONCAT(*args: E) -> E:
    def fn(vm):
        vs = [a(vm) for a in args]
        r = F.concat(*[v["lex"] for v in vs])
        if not vs:
            return t_string(F.lit(""))
        same_lang = F.lit(True)
        for v in vs[1:]:
            same_lang = same_lang & vs[0]["lang"].eqNullSafe(v["lang"])
        return F.when(vs[0]["lang"].isNotNull() & same_lang, t_lang(r, vs[0]["lang"])).otherwise(t_string(r))

    return E(fn)


def LANGMATCHES(tag: E, rng: E) -> E:
    rng = _e(rng)

    def fn(vm):
        t, r = tag(vm)["lex"], rng(vm)["lex"]
        lt, lr = F.lower(t), F.lower(r)
        return F.when(r == "*", F.length(t) > 0).otherwise((lt == lr) | lt.startswith(F.concat(lr, F.lit("-"))))

    return bool_e(fn)


def _xpath_flags(flags: str) -> str:
    """XPath flags i,s,m,x → Java inline flags (reference uses PCRE-style)."""
    return f"(?{flags})" if flags else ""


def REGEX(x: E, pattern: str, flags: str = "") -> E:
    pat = _xpath_flags(flags) + pattern

    def fn(vm):
        v = x(vm)
        return F.when(v.isNull() | ~is_stringish(v), _nullb()).otherwise(v["lex"].rlike(pat))

    return bool_e(fn)


def REPLACE(x: E, pattern: str, replacement: str, flags: str = "") -> E:
    pat = _xpath_flags(flags) + pattern
    return _str1(x, lambda c: F.regexp_replace(c, pat, replacement))


def _num1(x: E, col_fn) -> E:
    """Unary numeric op preserving the argument's datatype (§17.4.4) with
    canonical lexical form (integral values print without '.0')."""

    def fn(vm):
        v = x(vm)
        r = col_fn(num(v)).cast("double")
        lex = F.when(r == r.cast("long").cast("double"), r.cast("long").cast("string")).otherwise(
            r.cast("string")
        )
        return t_typed(lex, F.coalesce(v["dtype"], F.lit(XSD_DOUBLE)))

    return E(fn)


def ABS(x: E) -> E:
    return _num1(x, F.abs)


def CEIL(x: E) -> E:
    return _num1(x, F.ceil)


def FLOOR(x: E) -> E:
    return _num1(x, F.floor)


def ROUND(x: E) -> E:
    # SPARQL rounds half toward +∞; Spark's round() is half-away-from-zero —
    # differs on negative halves (SURVEY §2.8), so use floor(x+0.5)
    return _num1(x, lambda c: F.floor(c + 0.5))


def RAND() -> E:
    return E(lambda vm: t_double(F.rand()))


def NOW() -> E:
    return E(lambda vm: t_typed(F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), XSD_DATETIME))


def _dt_part(x: E, part_fn) -> E:
    return E(lambda vm: t_int(part_fn(ts(x(vm)))))


def YEAR(x: E) -> E:
    return _dt_part(x, F.year)


def MONTH(x: E) -> E:
    return _dt_part(x, F.month)


def DAY(x: E) -> E:
    return _dt_part(x, F.dayofmonth)


def HOURS(x: E) -> E:
    return _dt_part(x, F.hour)


def MINUTES(x: E) -> E:
    return _dt_part(x, F.minute)


def SECONDS(x: E) -> E:
    return _dt_part(x, F.second)


def TZ(x: E) -> E:
    """Timezone designator from the LEXICAL form (Spark timestamps lose the
    source offset — SURVEY §2.8)."""
    return E(lambda vm: t_string(F.regexp_extract(x(vm)["lex"], r"(Z|[+-]\d{2}:\d{2})$", 1)))


def TIMEZONE(x: E) -> E:
    """TIMEZONE (§17.4.5.7): the offset as xsd:dayTimeDuration — "Z" →
    "PT0S", "+05:30" → "PT5H30M", "-08:00" → "-PT8H"; no designator in the
    lexical form ⇒ error (NULL/unbound), per spec."""
    XSD_DAYTIME = "http://www.w3.org/2001/XMLSchema#dayTimeDuration"

    def fn(vm):
        lex = x(vm)["lex"]
        tz = F.regexp_extract(lex, r"(Z|[+-]\d{2}:\d{2})$", 1)
        sign = F.when(tz.startswith("-"), F.lit("-")).otherwise(F.lit(""))
        hh = F.substring(tz, 2, 2).cast("int")
        mm = F.substring(tz, 5, 2).cast("int")
        dur = F.when(tz == "Z", F.lit("PT0S")).otherwise(
            F.concat(
                sign,
                F.lit("PT"),
                F.when(hh > 0, F.concat(hh.cast("string"), F.lit("H"))).otherwise(F.lit("")),
                F.when(mm > 0, F.concat(mm.cast("string"), F.lit("M"))).otherwise(F.lit("")),
                F.when((hh == 0) & (mm == 0), F.lit("0S")).otherwise(F.lit("")),
            )
        )
        # (tz == "") is NULL when the input term is unbound — guard nulls
        # explicitly or the otherwise-branch builds a garbage "PT" literal
        return F.when((tz == "") | tz.isNull(), null_term()).otherwise(t_typed(dur, XSD_DAYTIME))

    return E(fn)


def _hash1(x: E, col_fn) -> E:
    """§17.4.4.9-13: the hash family takes a SIMPLE literal or xsd:string
    only — IRIs, lang-tagged, and typed literals are type errors (rows
    drop), not hashes of the lexical form."""

    def fn(vm):
        v = x(vm)
        ok = (v["kind"] == KIND_LITERAL) & (v["dtype"] == XSD_STRING) & v["lang"].isNull()
        return F.when(v.isNull() | ~ok, null_term()).otherwise(
            t_string(col_fn(v["lex"].cast("binary")))
        )

    return E(fn)


def MD5(x: E) -> E:
    return _hash1(x, F.md5)


def SHA1(x: E) -> E:
    return _hash1(x, F.sha1)


def SHA256(x: E) -> E:
    return _hash1(x, lambda c: F.sha2(c, 256))


def SHA384(x: E) -> E:
    return _hash1(x, lambda c: F.sha2(c, 384))


def SHA512(x: E) -> E:
    return _hash1(x, lambda c: F.sha2(c, 512))


def XSD_CAST(x: E, dtype_iri: str) -> E:
    """xsd constructor functions (§17.5): strict — empty/invalid lexical
    forms yield error (NULL), not 0."""
    target = {
        XSD_INTEGER: "long",
        XSD_DOUBLE: "double",
        XSD_DECIMAL: "double",
        XSD_BOOLEAN: "boolean",
        XSD_DATETIME: "timestamp",
        XSD_STRING: "string",
    }.get(dtype_iri, "string")

    def fn(vm):
        v = x(vm)
        casted = v["lex"].try_cast(target)
        out = casted.cast("string")
        if target == "timestamp":
            out = F.date_format(casted, "yyyy-MM-dd'T'HH:mm:ss")
        return F.when(v.isNull() | casted.isNull(), null_term()).otherwise(t_typed(out, dtype_iri))

    return E(fn)


#: extension-function registry keyed by IRI (rdf_sparql_eval.ml :: iri_funs)
IRI_FUNS: dict[str, Callable[..., E]] = {}


def register_fun(iri: str, fn: Callable[..., E]) -> None:
    IRI_FUNS[iri] = fn


def call_iri_fun(iri: str, *args: E) -> E:
    if iri not in IRI_FUNS:
        raise KeyError(f"unregistered extension function <{iri}>")
    return IRI_FUNS[iri](*args)
