"""Minimal CSS-selector engine over the stdlib ``html.parser`` (no
BeautifulSoup in this container).

Covers every selector shape the reference crawlers actually use for their
per-site extraction (SURVEY §2.2 M2/M3/M8/M9): tag names, ``.class``,
``#id``, ``[attr]`` / ``[attr=value]`` / ``[attr*=value]`` (substring —
``span[class*="ARTICLE_DATE_TIME"]``, Naver_Crawler.py:74; ``p[class*=
"perex"]``, VOA_Crawler.py:68) / ``[attr^=value]`` / ``[attr$=value]``
predicates, compound simple selectors (``img#img1[data-src]``), the
``:nth-of-type(n)`` / ``:first-of-type`` / ``:last-of-type`` pseudo-classes
(``span.byline em:nth-of-type(3)`` — Gukje_Crawler.py:70;
``span.txt_info:last-of-type`` — Daum_crawler.py:111), the descendant
combinator (``div.section_latest_article ul li`` — Naver_Crawler.py:109),
the child combinator ``>``, and comma alternation (``div.XlKvRb,
div.NiLAwe`` — Google_Crawler.py:163-166). Matching is document-order DFS
with right-to-left compound verification — the classic engine shape.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # Element | str
        self.parent = parent

    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    @property
    def text(self) -> str:
        """Concatenated descendant text (BeautifulSoup ``.text`` shape)."""
        out: list[str] = []

        def walk(el: Element) -> None:
            for c in el.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(out)

    def iter(self):
        """Document-order DFS over descendant elements (self excluded)."""
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.iter()

    def inner_html(self) -> str:
        out: list[str] = []

        def render(el) -> None:
            if isinstance(el, str):
                out.append(el)
                return
            attrs = "".join(
                f' {k}="{v}"' if v is not None else f" {k}" for k, v in el.attrs.items()
            )
            if el.tag in VOID_TAGS:
                out.append(f"<{el.tag}{attrs}/>")
                return
            out.append(f"<{el.tag}{attrs}>")
            for c in el.children:
                render(c)
            out.append(f"</{el.tag}>")

        for c in self.children:
            render(c)
        return "".join(out)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Element(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        # close the nearest matching open element (tolerant of stray tags)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Element:
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# -- selector parsing --------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\]|:[\w-]+(?:\([^)]*\))?)*)"
)
_PART_RE = re.compile(r"[.#][\w-]+|\[[^\]]+\]|:[\w-]+(?:\([^)]*\))?")
_ATTR_OP_RE = re.compile(r"^([\w-]+)\s*(\*=|\^=|\$=|=)\s*(.*)$")


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs", "pseudos")

    def __init__(self, src: str):
        m = _SIMPLE_RE.match(src)
        if m is None or m.end() != len(src):
            raise ValueError(f"unsupported selector fragment {src!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str, str | None]] = []  # (key, op, value)
        self.pseudos: list[tuple[str, int | None]] = []
        for part in _PART_RE.findall(m.group("rest") or ""):
            if part.startswith("."):
                self.classes.append(part[1:])
            elif part.startswith("#"):
                self.id = part[1:]
            elif part.startswith(":"):
                body = part[1:]
                if body.startswith("nth-of-type(") and body.endswith(")"):
                    self.pseudos.append(("nth-of-type", int(body[12:-1])))
                elif body in ("first-of-type", "last-of-type"):
                    self.pseudos.append((body, None))
                else:
                    raise ValueError(f"unsupported pseudo-class :{body}")
            else:  # [attr] / [attr=v] / [attr*=v] / [attr^=v] / [attr$=v]
                body = part[1:-1]
                om = _ATTR_OP_RE.match(body)
                if om:
                    self.attrs.append(
                        (om.group(1), om.group(2), om.group(3).strip().strip("'\""))
                    )
                else:
                    self.attrs.append((body.strip(), "", None))

    def matches(self, el: Element) -> bool:
        if self.tag is not None and el.tag != self.tag:
            return False
        if self.id is not None and el.attrs.get("id") != self.id:
            return False
        if self.classes and not set(self.classes) <= el.classes:
            return False
        for k, op, v in self.attrs:
            if k not in el.attrs:
                return False
            have = el.attrs.get(k) or ""
            if op == "=" and have != v:
                return False
            if op == "*=" and v not in have:
                return False
            if op == "^=" and not have.startswith(v):
                return False
            if op == "$=" and not have.endswith(v):
                return False
        for name, arg in self.pseudos:
            parent = el.parent
            sibs = (
                [
                    c
                    for c in parent.children
                    if isinstance(c, Element) and c.tag == el.tag
                ]
                if parent is not None
                else [el]
            )
            pos = sibs.index(el)
            if name == "nth-of-type" and pos != arg - 1:
                return False
            if name == "first-of-type" and pos != 0:
                return False
            if name == "last-of-type" and pos != len(sibs) - 1:
                return False
        return True


_TOKEN_RE = re.compile(r">|(?:[^\s>\[]|\[[^\]]*\])+")


def _compile_one(sel: str) -> list[tuple[str, _Simple]]:
    """'div.a > ul li' → [('descendant', div.a), ('child', ul), ('descendant', li)].
    Tokenization is bracket-aware so attribute values may contain spaces
    (``span[data-date-time=2025-04-18 08:10]``)."""
    toks = _TOKEN_RE.findall(sel)
    out: list[tuple[str, _Simple]] = []
    comb = "descendant"
    for t in toks:
        if t == ">":
            comb = "child"
            continue
        out.append((comb, _Simple(t)))
        comb = "descendant"
    if not out:
        raise ValueError(f"empty selector {sel!r}")
    return out


def select(root: Element, selector: str) -> list[Element]:
    """All elements matching ``selector`` in document order."""
    chains = [_compile_one(s) for s in selector.split(",") if s.strip()]
    out = []
    for el in root.iter():
        if any(_matches_chain_full(el, ch) for ch in chains):
            out.append(el)
    return out


def _matches_chain_full(el: Element, chain: list[tuple[str, _Simple]]) -> bool:
    if not chain[-1][1].matches(el):
        return False
    # walk remaining simples right-to-left up the ancestor chain
    idx = len(chain) - 1
    node = el
    while idx > 0:
        comb = chain[idx][0]  # link between chain[idx-1] and chain[idx]
        simple = chain[idx - 1][1]
        node = node.parent
        if comb == "child":
            if node is None or node.tag == "#root" or not simple.matches(node):
                return False
        else:
            while node is not None and node.tag != "#root" and not simple.matches(node):
                node = node.parent
            if node is None or node.tag == "#root":
                return False
        idx -= 1
    return True


def select_one(root: Element, selector: str) -> Element | None:
    found = select(root, selector)
    return found[0] if found else None
