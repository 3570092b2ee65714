"""RDF/XML reader (W3C RDF/XML Syntax, the subset in real-world use).

Parity: the reference's rdf_xml.ml reader (SURVEY §2.2 — rdf:about/ID/
nodeID/resource, property attributes, parseType Literal/Resource/
Collection, rdf:li containers, xml:base/xml:lang). Built on the stdlib
`xml.etree.ElementTree` (the reference uses `xmlm`); pure Python so it
runs inside the same Arrow-batched extraction UDF as every other parser
(BASELINE.json:16 — no per-row Python outside the batched stage).

Emits (s, p, o) Term triples; document-local bnode labels (`_global_bnode`
in extract.py rewrites them to partition-safe ids).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator, Optional

from ..types import RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, BNode, Iri, Literal, Term
from .iri import resolve

RDF = "{" + RDF_NS + "}"
XML_NS = "http://www.w3.org/XML/1998/namespace"
XML_BASE = "{" + XML_NS + "}base"
XML_LANG = "{" + XML_NS + "}lang"

# attributes that are syntax, not properties
_SYNTAX_ATTRS = {
    RDF + "about", RDF + "ID", RDF + "nodeID", RDF + "resource",
    RDF + "datatype", RDF + "parseType", XML_BASE, XML_LANG,
}
_OLD_TERMS = {RDF + "aboutEach", RDF + "aboutEachPrefix", RDF + "bagID"}


class RdfXmlParser:
    def __init__(self, text: str, base: Optional[str] = None):
        self.text = text
        self.base = base
        self._bn = 0
        self._li = {}

    def _bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"rx{self._bn}")

    def _qname_iri(self, tag: str) -> str:
        # ElementTree gives '{ns}local'
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return resolve(tag, self.base)

    def parse(self) -> list[tuple[Term, Iri, Term]]:
        root = ET.fromstring(self.text)
        out: list[tuple[Term, Iri, Term]] = []
        base = root.get(XML_BASE, self.base)
        if root.tag == RDF + "RDF":
            for child in root:
                self._node_element(child, base, None, out)
        else:
            self._node_element(root, base, None, out)
        return out

    # -- node elements ------------------------------------------------------

    def _subject_of(self, el: ET.Element, base: Optional[str]) -> Term:
        about = el.get(RDF + "about")
        rid = el.get(RDF + "ID")
        nid = el.get(RDF + "nodeID")
        if about is not None:
            return Iri(resolve(about, base))
        if rid is not None:
            return Iri(resolve("#" + rid, base))
        if nid is not None:
            return BNode(nid)
        return self._bnode()

    def _node_element(self, el: ET.Element, base: Optional[str], lang: Optional[str], out) -> Term:
        for a in _OLD_TERMS:
            if a in el.attrib:
                raise ValueError(f"obsolete RDF/XML attribute {a}")
        base = el.get(XML_BASE, base)
        lang = el.get(XML_LANG, lang)
        subj = self._subject_of(el, base)

        # typed node element: <ex:Thing rdf:about=...>
        if el.tag != RDF + "Description":
            out.append((subj, Iri(RDF_TYPE), Iri(self._qname_iri(el.tag))))

        # property attributes (non-syntax, non-rdf:type attrs → string literals)
        for k, v in el.attrib.items():
            if k in _SYNTAX_ATTRS or k.startswith("{" + XML_NS + "}"):
                continue
            piri = self._qname_iri(k)
            if piri == RDF_TYPE:
                out.append((subj, Iri(RDF_TYPE), Iri(resolve(v, base))))
            else:
                out.append((subj, Iri(piri), Literal(v, lang=lang)))

        self._li[id(el)] = 0
        for pel in el:
            self._property_element(subj, pel, base, lang, out, li_key=id(el))
        return subj

    # -- property elements --------------------------------------------------

    def _pred_iri(self, el: ET.Element, parent_key) -> Iri:
        if el.tag == RDF + "li":
            self._li[parent_key] = self._li.get(parent_key, 0) + 1
            return Iri(f"{RDF_NS}_{self._li[parent_key]}")
        return Iri(self._qname_iri(el.tag))

    def _property_element(self, subj: Term, el: ET.Element, base, lang, out, li_key=None) -> None:
        base = el.get(XML_BASE, base)
        lang = el.get(XML_LANG, lang)
        pred = self._pred_iri(el, li_key if li_key is not None else id(el))
        ptype = el.get(RDF + "parseType")
        resource = el.get(RDF + "resource")
        nid = el.get(RDF + "nodeID")
        dtype = el.get(RDF + "datatype")

        if ptype == "Resource":
            b = self._bnode()
            out.append((subj, pred, b))
            self._li[id(el)] = 0
            for pel in el:
                self._property_element(b, pel, base, lang, out, li_key=id(el))
            return
        if ptype == "Collection":
            items = [self._node_element(c, base, lang, out) for c in el]
            head: Term = Iri(RDF_NIL)
            cells = []
            for _ in items:
                cells.append(self._bnode())
            for i, item in enumerate(items):
                out.append((cells[i], Iri(RDF_FIRST), item))
                rest = cells[i + 1] if i + 1 < len(cells) else Iri(RDF_NIL)
                out.append((cells[i], Iri(RDF_REST), rest))
            if cells:
                head = cells[0]
            out.append((subj, pred, head))
            return
        if ptype == "Literal":
            xml_str = "".join(
                ([el.text or ""] + [ET.tostring(c, encoding="unicode") for c in el])
            )
            out.append((subj, pred, Literal(xml_str, dtype=RDF_NS + "XMLLiteral")))
            return

        if resource is not None:
            obj: Term = Iri(resolve(resource, base))
            out.append((subj, pred, obj))
            self._prop_attrs_on_ref(el, obj, base, lang, out)
            return
        if nid is not None:
            obj = BNode(nid)
            out.append((subj, pred, obj))
            self._prop_attrs_on_ref(el, obj, base, lang, out)
            return

        children = list(el)
        if children:
            # resource-valued: exactly one nested node element
            obj = self._node_element(children[0], base, lang, out)
            out.append((subj, pred, obj))
            return

        # literal (possibly typed) — or empty property attrs → bnode
        prop_attrs = [
            (k, v) for k, v in el.attrib.items() if k not in _SYNTAX_ATTRS and not k.startswith("{" + XML_NS + "}")
        ]
        if prop_attrs and not (el.text or "").strip():
            b = self._bnode()
            out.append((subj, pred, b))
            for k, v in prop_attrs:
                piri = self._qname_iri(k)
                if piri == RDF_TYPE:
                    out.append((b, Iri(RDF_TYPE), Iri(resolve(v, base))))
                else:
                    out.append((b, Iri(piri), Literal(v, lang=lang)))
            return
        text = el.text or ""
        if dtype is not None:
            out.append((subj, pred, Literal(text, dtype=resolve(dtype, base))))
        else:
            out.append((subj, pred, Literal(text, lang=lang)))

    def _prop_attrs_on_ref(self, el, obj: Term, base, lang, out) -> None:
        for k, v in el.attrib.items():
            if k in _SYNTAX_ATTRS or k.startswith("{" + XML_NS + "}"):
                continue
            piri = self._qname_iri(k)
            if piri == RDF_TYPE:
                out.append((obj, Iri(RDF_TYPE), Iri(resolve(v, base))))
            else:
                out.append((obj, Iri(piri), Literal(v, lang=lang)))


def parse_rdfxml(text: str, base: Optional[str] = None) -> list[tuple[Term, Iri, Term]]:
    return RdfXmlParser(text, base).parse()
