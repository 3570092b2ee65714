"""IRI resolution and validation — RFC 3986/3987 reference resolution.

Parity target: rdf_iri.ml :: of_string / append / to_uri (reference parses,
normalizes, and resolves IRIs against a base; invalid IRIs raise —
SURVEY §1.1). Implemented from the RFC 3986 §5 algorithm directly (not
urllib.urljoin, whose legacy RFC 1808 quirks differ on corner cases) so the
result is deterministic and spec-exact.
"""

from __future__ import annotations

import re

_SPLIT = re.compile(
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*):)?"
    r"(?://(?P<authority>[^/?#]*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$",
    re.S,
)


class IriError(ValueError):
    """Raised on invalid IRIs (mirrors rdf_iri.ml's Invalid_iri)."""


def split_iri(iri: str):
    m = _SPLIT.match(iri)
    if m is None:  # regex is total; kept for safety
        raise IriError(f"unparseable IRI: {iri!r}")
    return m.group("scheme"), m.group("authority"), m.group("path"), m.group("query"), m.group("fragment")


def _merge(base_auth: str | None, base_path: str, ref_path: str) -> str:
    if base_auth is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    return (base_path[: i + 1] if i >= 0 else "") + ref_path


def remove_dot_segments(path: str) -> str:
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _recompose(scheme, authority, path, query, fragment) -> str:
    r = ""
    if scheme is not None:
        r += scheme + ":"
    if authority is not None:
        r += "//" + authority
    r += path
    if query is not None:
        r += "?" + query
    if fragment is not None:
        r += "#" + fragment
    return r


def resolve(ref: str, base: str | None) -> str:
    """RFC 3986 §5.2 reference resolution. `base` None ⇒ ref must be absolute."""
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)
    if r_scheme is not None:
        # already-absolute: return VERBATIM. Strict §5.2.2 would
        # remove_dot_segments here too, but that makes the Turtle path
        # disagree with the N-Triples parser (no resolution) on the same
        # document — e.g. <http://ex.org/.> would lose its final '.' —
        # and mainstream parsers (rdflib, Jena, Serd) pass absolute IRIs
        # through untouched. Interop wins; dot-segment removal still
        # applies to every RELATIVE reference below.
        return ref
    if base is None:
        raise IriError(f"relative IRI {ref!r} with no base")
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    if b_scheme is None:
        raise IriError(f"base IRI {base!r} is not absolute")
    if r_auth is not None:
        return _recompose(b_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    if r_path == "":
        return _recompose(b_scheme, b_auth, b_path, r_query if r_query is not None else b_query, r_frag)
    if r_path.startswith("/"):
        path = remove_dot_segments(r_path)
    else:
        path = remove_dot_segments(_merge(b_auth, b_path, r_path))
    return _recompose(b_scheme, b_auth, path, r_query, r_frag)


_ABS = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_BAD_CHARS = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def is_absolute(iri: str) -> bool:
    return _ABS.match(iri) is not None


def validate(iri: str) -> str:
    """Reject IRIs with characters forbidden in IRIREF productions (the
    reference raises on invalid IRIs at parse time)."""
    if _BAD_CHARS.search(iri):
        raise IriError(f"invalid character in IRI: {iri!r}")
    if not is_absolute(iri):
        raise IriError(f"IRI not absolute: {iri!r}")
    return iri


def url_host(url: str) -> str:
    """Registrable host of a URL — the skew/salting key (north rule)."""
    _, auth, _, _, _ = split_iri(url)
    if not auth:
        return ""
    host = auth.rsplit("@", 1)[-1]
    # strip port (not IPv6-bracket aware beyond the common case)
    if host.startswith("["):
        return host.split("]")[0] + "]"
    return host.split(":")[0].lower()
