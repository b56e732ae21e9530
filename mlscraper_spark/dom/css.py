"""Minimal CSS selector engine over flat node records.

Implements exactly the selector grammar the reference engine emits
(``/root/reference/mlscraper/selectors.py:159-223``) and its tests consume:

    compound   := [tag] ( '#id' | '.class' | '[attr]' | '[attr="value"]' )*
                  [ ':nth-child(N)' ]
    selector   := compound ( ( ' ' | ' > ' ) compound )*

Evaluation semantics mirror soupsieve as used by the reference:
``select(root, rule)`` returns *strict descendants* of ``root`` in document
order (``/root/reference/mlscraper/html.py:156-160``); ancestor compounds in
a combinator chain may match nodes above the scope root (soupsieve behavior);
``:nth-child(N)`` is the real CSS semantic — position among element siblings.
"""
from __future__ import annotations

import re
from dataclasses import dataclass

from mlscraper_spark.dom.parser import NodeRec

_COMPOUND_RE = re.compile(
    r"""^
    (?P<tag>[a-zA-Z][\w-]*)?
    (?P<rest>(?:\#[\w\-]+|\.[\w\-]+|\[[^\]]+\])*)
    (?::nth-child\((?P<nth>\d+)\))?
    $""",
    re.X,
)
_PART_RE = re.compile(r"\#[\w\-]+|\.[\w\-]+|\[[^\]]+\]")
_ATTR_RE = re.compile(r'^\[([\w\-]+)(?:="([^"]*)")?\]$')


@dataclass(frozen=True)
class Compound:
    tag: str | None
    id_attr: str | None
    classes: tuple[str, ...]
    attrs: tuple[tuple[str, str | None], ...]  # (name, value-or-None=presence)
    nth_child: int | None


class SelectorParseError(ValueError):
    pass


def _tokenize(rule: str) -> list[str]:
    """Split on whitespace, but not inside [...] (attr values may contain
    spaces — the reference's plain-value guard ``selectors.py:184-186`` only
    checks the *first* character, so quoted values with spaces are emitted)."""
    tokens: list[str] = []
    buf: list[str] = []
    in_brackets = False
    for ch in rule:
        if ch == "[":
            in_brackets = True
        elif ch == "]":
            in_brackets = False
        if ch.isspace() and not in_brackets:
            if buf:
                tokens.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        tokens.append("".join(buf))
    return tokens


def _parse_compound(token: str) -> Compound:
    m = _COMPOUND_RE.match(token)
    if not m:
        raise SelectorParseError(f"cannot parse compound: {token!r}")
    tag = m.group("tag")
    id_attr = None
    classes: list[str] = []
    attrs: list[tuple[str, str | None]] = []
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("#"):
            id_attr = part[1:]
        elif part.startswith("."):
            classes.append(part[1:])
        else:
            am = _ATTR_RE.match(part)
            if not am:
                raise SelectorParseError(f"cannot parse attr selector: {part!r}")
            attrs.append((am.group(1), am.group(2)))
    nth = m.group("nth")
    return Compound(tag, id_attr, tuple(classes), tuple(attrs),
                    int(nth) if nth else None)


def parse_selector(rule: str) -> list[tuple[str, Compound]]:
    """Parse into [(combinator, compound), ...]; first combinator is ''.

    Combinators: ' ' (descendant) and '>' (child) — the only two the
    reference generates (``selectors.py:218-220``).
    """
    tokens = _tokenize(rule)
    out: list[tuple[str, Compound]] = []
    comb = ""
    for tok in tokens:
        if tok == ">":
            if comb != " " or not out:
                raise SelectorParseError(f"misplaced '>' in {rule!r}")
            comb = ">"
            continue
        out.append((comb, _parse_compound(tok)))
        comb = " "
    if not out:
        raise SelectorParseError(f"empty selector: {rule!r}")
    return out


class PageDOM:
    """Random-access DOM view over a page's node records.

    Built once per page inside an Arrow UDF batch (or on the driver during
    training) — plays the role of the reference's interned soup
    (``html.py:187-207``) with ids instead of pointers.
    """

    def __init__(self, records: list[NodeRec]):
        self.records = records
        self._selector_cache: dict[tuple[int, str], list[int]] = {}
        # preorder => subtree of node i is the contiguous id range
        # (i, subtree_end[i]]; computed with one reverse scan over depths
        n = len(records)
        end = [n] * n
        stack: list[int] = []
        for i, r in enumerate(records):
            while stack and records[stack[-1]].depth >= r.depth:
                end[stack.pop()] = i
            stack.append(i)
        self.subtree_end = end

    def __len__(self) -> int:
        return len(self.records)

    def node(self, node_id: int) -> NodeRec:
        return self.records[node_id]

    def _matches_compound(self, rec: NodeRec, c: Compound) -> bool:
        if c.tag is not None and rec.tag != c.tag:
            return False
        if c.id_attr is not None and rec.attrs.get("id") != c.id_attr:
            return False
        if c.classes:
            rc = rec.classes
            if any(cl not in rc for cl in c.classes):
                return False
        for name, value in c.attrs:
            if name not in rec.attrs:
                return False
            if value is not None and rec.attrs[name] != value:
                return False
        if c.nth_child is not None and rec.sibling_index != c.nth_child:
            return False
        return True

    def _chain_matches(self, rec: NodeRec, chain: list[tuple[str, Compound]],
                       i: int) -> bool:
        """Does ``rec`` satisfy the ancestor requirements of chain[:i+1]?"""
        comb, comp = chain[i]
        if not self._matches_compound(rec, comp):
            return False
        if i == 0:
            return True
        prev_comb = comb  # combinator *between* chain[i-1] and chain[i]
        recs = self.records
        if prev_comb == ">":
            pid = rec.parent_id
            return pid >= 0 and self._chain_matches(recs[pid], chain, i - 1)
        for aid in rec.ancestor_ids:
            if self._chain_matches(recs[aid], chain, i - 1):
                return True
        return False

    def select(self, root_id: int, rule: str, limit: int | None = None) -> list[int]:
        """Strict descendants of root matching rule, in document order.

        ``root_id = -1`` selects from the whole document (the Page root).
        Mirrors ``Node.select`` limit semantics (``html.py:156-160``).
        """
        cached = self._selector_cache.get((root_id, rule))
        if cached is not None:
            return cached if limit is None else cached[:limit]
        if limit is not None:
            cached = self._selector_cache.get((root_id, rule, limit))
            if cached is not None:
                return cached
        chain = parse_selector(rule)
        recs = self.records
        out: list[int] = []
        if root_id < 0:
            candidates = range(len(recs))
        else:
            candidates = range(root_id + 1, self.subtree_end[root_id])
        last_i = len(chain) - 1
        for nid in candidates:
            if self._chain_matches(recs[nid], chain, last_i):
                out.append(nid)
                if limit is not None and len(out) >= limit:
                    # cache truncated results under a limit-qualified key
                    # (the reference lru_caches the equivalent select,
                    # selectors.py:59-70)
                    self._selector_cache[(root_id, rule, limit)] = out
                    return out
        self._selector_cache[(root_id, rule)] = out
        return out

    def text(self, node_id: int) -> str:
        return self.records[node_id].text
