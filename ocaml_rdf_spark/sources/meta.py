"""Page-metadata extractor: OpenGraph, Twitter cards, standard `<meta>`
descriptors, `<title>`, and `rel=alternate hreflang` links → triples.

Not in the reference (ocaml-rdf parses explicit RDF syntaxes); this is
the north rule's web-KG scope applied to the SECOND-largest structured
annotation layer on the web after microdata: the Open Graph protocol
(`<meta property="og:…">`, public spec at ogp.me — og IS an RDFa
vocabulary, but real-world pages omit the `prefix` declaration, so a
conforming RDFa walk drops them; this extractor applies the published
initial-context binding `og: → http://ogp.me/ns#` the way every
production crawler does) plus Twitter-card `name="twitter:…"` tags and
the classic description/keywords/author/robots meta set.

Mapping (deterministic, page-as-subject):

- subject is always the page IRI (the fetched URL — og:url is a CLAIM
  of canonicality and lands as an object, never silently rewrites the
  subject).
- `<meta property="og:X" content=C>` → `(page, http://ogp.me/ns#X, C)`;
  og:url / og:image / og:audio / og:video (+ their :url/:secure_url
  structured forms) resolve C as an IRI against the page base, all
  other og properties stay string literals (the ogp.me typing).
- `<meta name="twitter:X" content=C>` → `(page, urn:x-ords:meta:twitter:X, C)`
  (Twitter never published an IRI namespace — private-use URN, same
  convention as tables.py's vocabulary).
- `<meta name=N content=C>` for N ∈ {description, keywords, author,
  robots, generator} → `(page, urn:x-ords:meta:N, C)`.
- `<title>T</title>` (first only) → `(page, urn:x-ords:meta:title, T)`
  whitespace-collapsed.
- `<link rel="alternate" hreflang=L href=H>` →
  `(page, urn:x-ords:meta:alternate:L, <resolved H>)` — the hreflang
  cluster used for cross-language entity alignment.

Empty content values emit nothing (RDF is sparse). Duplicate tags emit
duplicate triples — global set-semantics dedup is the materializer's job
(extract.py::dedup_triples), same as every other extractor.
"""

from __future__ import annotations

import re

from .htmldom import Node
from .iri import resolve
from ..types import Iri, Literal, Term

OG_NS = "http://ogp.me/ns#"
META_NS = "urn:x-ords:meta:"

#: og properties whose content is a URL per the ogp.me spec
_OG_IRI_PROPS = frozenset(
    ["url", "image", "audio", "video"]
    + [f"{m}:url" for m in ("image", "audio", "video")]
    + [f"{m}:secure_url" for m in ("image", "audio", "video")]
)

_PLAIN_META = frozenset(("description", "keywords", "author", "robots", "generator"))

_WS = re.compile(r"\s+")


def _collapse(s: str) -> str:
    return _WS.sub(" ", s).strip()


def extract_meta_tree(root: Node, base: str) -> list[tuple[Term, Iri, Term]]:
    """Walk the DOM once; return (s, p, o) rows in the extractor
    convention (Iri predicate, Iri/Literal terms — extract.py::emit)."""
    page = Iri(base)
    out: list[tuple[Term, Iri, Term]] = []
    saw_title = False
    for el in root.walk():
        if el.tag == "meta":
            content = el.get("content")
            if content is None or not _collapse(content):
                continue
            content = _collapse(content)
            prop = (el.get("property") or "").strip()
            name = (el.get("name") or "").strip().lower()
            if prop.startswith("og:"):
                key = prop[3:]
                pred = Iri(OG_NS + key)
                if key in _OG_IRI_PROPS:
                    out.append((page, pred, Iri(resolve(content, base))))
                else:
                    out.append((page, pred, Literal(content)))
            elif name.startswith("twitter:"):
                out.append((page, Iri(META_NS + name), Literal(content)))
            elif name in _PLAIN_META:
                out.append((page, Iri(META_NS + name), Literal(content)))
        elif el.tag == "title" and not saw_title:
            t = _collapse(el.text())
            if t:
                out.append((page, Iri(META_NS + "title"), Literal(t)))
                saw_title = True
        elif el.tag == "link":
            rels = (el.get("rel") or "").lower().split()
            href = el.get("href")
            lang = (el.get("hreflang") or "").strip()
            if "alternate" in rels and href and lang:
                out.append((page, Iri(f"{META_NS}alternate:{lang}"), Iri(resolve(href, base))))
    return out
