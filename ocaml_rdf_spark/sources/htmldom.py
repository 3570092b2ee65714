"""Tolerant mini-DOM over stdlib html.parser.

Shared substrate for the HTML-embedded extractors (text, RDFa, microdata,
script-tag JSON-LD/Turtle). Deterministic pure Python — no version-floating
C libraries — because the north rule requires byte-identical extracted text
per url across runs (BASELINE.json:16).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# elements whose text content is never document text
NON_TEXT_TAGS = frozenset(("script", "style", "template", "noscript"))

# elements that imply a line boundary in extracted text
BLOCK_TAGS = frozenset(
    """address article aside blockquote body dd details dialog div dl dt
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup
    hr html li main nav ol p pre section table tbody td tfoot th thead tr
    ul br title""".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # Node | str
        self.parent = parent

    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    def has(self, name: str) -> bool:
        return name in self.attrs

    def itertext(self):
        for c in self.children:
            if isinstance(c, str):
                yield c
            elif c.tag not in NON_TEXT_TAGS:
                yield from c.itertext()

    def text(self) -> str:
        return "".join(self.itertext())

    def walk(self):
        """Depth-first pre-order over element nodes."""
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.walk()


class _Builder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.cur.children.append(Node(tag, dict(attrs), self.cur))
            return
        # tolerate misnesting: an open <p> is implicitly closed by block tags
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


class _RawCollector(HTMLParser):
    """Collect raw (un-entity-decoded) contents of <script>/<pre> so Turtle
    and JSON-LD payloads survive byte-exact. html.parser already treats
    <script> as CDATA; we additionally disable charref conversion."""

    def __init__(self, wanted: tuple[str, ...]):
        super().__init__(convert_charrefs=False)
        self.wanted = wanted
        self.blocks: list[tuple[str, dict[str, str], str]] = []
        self._stack: list[tuple[str, dict[str, str], list[str]]] = []

    def handle_starttag(self, tag, attrs):
        if tag in self.wanted:
            self._stack.append((tag, dict(attrs), []))

    def handle_endtag(self, tag):
        if self._stack and self._stack[-1][0] == tag:
            t, a, parts = self._stack.pop()
            self.blocks.append((t, a, "".join(parts)))

    def _collect(self, data):
        if self._stack:
            self._stack[-1][2].append(data)

    def handle_data(self, data):
        self._collect(data)

    def handle_entityref(self, name):
        self._collect(f"&{name};")

    def handle_charref(self, name):
        self._collect(f"&#{name};")


def parse_html(html: str) -> Node:
    b = _Builder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass  # tolerant: keep whatever tree was built
    return b.root


def raw_blocks(html: str, tags: tuple[str, ...] = ("script", "pre")) -> list[tuple[str, dict[str, str], str]]:
    """(tag, attrs, raw_text) for each wanted element, document order."""
    c = _RawCollector(tags)
    try:
        c.feed(html)
        c.close()
    except Exception:
        pass
    return c.blocks


def collect_raw_blocks(
    root: Node, tags: tuple[str, ...] = ("script", "pre")
) -> list[tuple[str, dict[str, str], str]]:
    """Tree-based equivalent of `raw_blocks` for callers that already hold a
    parsed DOM — lets the extraction stage parse each page ONCE instead of
    once per extractor family.

    Entity semantics vs `raw_blocks`: <script> is CDATA to html.parser, so
    its content reaches the tree raw (charrefs unconverted) — byte-equal to
    the _RawCollector output. Non-CDATA blocks (<pre>) arrive with charrefs
    converted once, which equals _RawCollector-raw + one html.unescape —
    callers taking blocks from here must NOT unescape again.
    """
    out: list[tuple[str, dict[str, str], str]] = []

    def gather(n: Node) -> str:
        parts: list[str] = []

        def rec(x: Node) -> None:
            for c in x.children:
                if isinstance(c, str):
                    parts.append(c)
                elif c.tag not in tags:  # nested wanted tags are their own blocks
                    rec(c)

        rec(n)
        return "".join(parts)

    for el in root.walk():
        if el.tag in tags:
            out.append((el.tag, el.attrs, gather(el)))
    return out
