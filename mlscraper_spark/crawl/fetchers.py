"""Pluggable fetch adapters for the crawl engine's Arrow fetch stage.

The BSP epoch loop is fetch-agnostic: ``engine._fetch_udf`` talks to an
adapter's two methods and nothing else, so swapping what "fetch" means
never touches frontier/politeness/seen-check/snapshot logic:

* ``fetch(url_canon) -> (status, body_bytes)``
* ``response_meta(url_canon, status, body) -> (raw_hrefs, n_images)``
* ``robots(host) -> rule_prefixes`` — the robots.txt resolution for a
  host (engine ``_robots_rules_df`` caches one row per host per crawl);
  entries starting with ``+`` are Allow prefixes, all others Disallow
  (see ``robots_blocked`` for the longest-match semantics)

``SynthWebAdapter`` (the default) binds the deterministic synthetic web
that every oracle-equivalence test pins.  ``HttpFetchAdapter`` is the
real-network implementation — stdlib ``urllib`` transport, link
extraction via this repo's own DOM parser (``dom/parser.py``), so it
handles single-quoted/unquoted hrefs that synthweb's regex fast path
deliberately does not.  No network exists in this sandbox, so its tests
inject a fake opener; the transport code itself is plain stdlib and runs
anywhere.

Adapters are pickled into the Arrow fetch workers: keep them small and
free of open sockets/sessions (create per-call, or lazily per-process).
"""
from __future__ import annotations

from dataclasses import dataclass

from mlscraper_spark.crawl.synthweb import WebConfig, fetch, response_meta


class FetchAdapter:
    """Interface consumed by ``engine._fetch_udf``."""

    def fetch(self, url_canon: str) -> tuple[int, bytes]:
        raise NotImplementedError

    def response_meta(self, url_canon: str, status: int,
                      body: bytes) -> tuple[list[str], int]:
        raise NotImplementedError

    def robots(self, host: str) -> list[str]:
        """Rule path-prefixes for the host.  A plain entry is a Disallow
        prefix; an entry starting with ``+`` is an Allow prefix (the ``+``
        stripped before matching — URL paths always start with ``/``, so
        the sigil is unambiguous).  A URL is blocked per RFC 9309 §2.2.2
        longest-match: the longest matching rule decides, Allow winning
        length ties — see ``robots_blocked``, the reference predicate the
        engine's JVM filter mirrors.  A pure-disallow list (every adapter
        before Allow support, and the synthetic web today) behaves exactly
        as the old "blocked iff any prefix matches" contract."""
        raise NotImplementedError

    def robots_col(self, host_col):
        """OPTIONAL JVM fast path: a Spark Column computing
        ``json.dumps(self.robots(host))`` from a host column, or None
        (default) when robots resolution genuinely needs per-host I/O or
        Python.  When provided it must equal ``robots`` for EVERY host
        string — the engine uses it verbatim in place of the Arrow stage,
        so a divergence would split the engine from the oracle.  Adapters
        whose rules are pure functions (the synthetic web) provide it;
        ``HttpFetchAdapter`` cannot (rules come from network fetches)."""
        return None

    def robots_blocked_col(self, host_col, path_col):
        """OPTIONAL JVM fast path for the robots FILTER: a boolean Column
        equal to ``robots_blocked(path, self.robots(host))``,
        or None (default).  When provided, the engine filters seeds and
        discoveries with this expression directly — no robots broadcast
        join on the hot path at all (the robots table is still written for
        bookkeeping).  Only sound when rules are a pure function of the
        host (time-invariant by construction), which is the same condition
        as ``robots_col``."""
        return None


@dataclass(frozen=True)
class SynthWebAdapter(FetchAdapter):
    """The deterministic synthetic web (default; oracle-pinned)."""

    web: WebConfig

    def fetch(self, url_canon: str) -> tuple[int, bytes]:
        return fetch(url_canon, self.web)

    def response_meta(self, url_canon: str, status: int,
                      body: bytes) -> tuple[list[str], int]:
        return response_meta(url_canon, status, body, self.web)

    def robots(self, host: str) -> list[str]:
        return self.web.robots_disallow(host)

    def robots_col(self, host_col):
        """Catalyst mirror of ``WebConfig.robots_disallow`` (see its
        docstring for why the python side is regex-specified): whole-stage
        codegen instead of an Arrow stage over every new host.  Pinned
        equal to the python rules over adversarial host strings by
        tests/test_crawl.py::test_synth_robots_col_matches_python.

        A subclass that overrides ``robots`` (custom python rules) must
        not inherit this mirror — it would silently shadow the override —
        so the fast path withdraws itself unless ``robots`` is ours."""
        if type(self).robots is not SynthWebAdapter.robots:
            return None
        from pyspark.sql import functions as F

        return F.when(
            self._robots_hit(host_col), F.lit('["/private/"]')
        ).otherwise(F.lit("[]"))

    @staticmethod
    def _robots_hit(host_col):
        from pyspark.sql import functions as F

        # Structural decomposition of ``^host([0-9]{1,18})(\.[\s\S]*)?\z``
        # with translate()-based charset tests instead of a per-row regex:
        # the regex ran inside the discovery-filter FilterExec, which does
        # no subexpression elimination, so it executed per conjunct
        # reference on EVERY discovered link (r6 measurement: the regex
        # gate family was ~8 s/epoch at the 4M-link width).  seg = the
        # piece after 'host' up to the first '.' (or end); rule-bearing
        # iff seg is 1-18 digits and seg % 5 == 2 — the same language:
        # digits then end-or-dot-then-anything.  \z semantics fall out for
        # free (no anchors anywhere), and a trailing '\n' lands in seg or
        # the post-dot tail: in seg it fails the digit test, after a dot
        # it is allowed by both sides.
        seg = F.substring_index(F.substring(host_col, 5, 1 << 30), ".", 1)
        seg_digits = (
            (F.length(seg) >= 1) & (F.length(seg) <= 18)
            & (F.length(F.translate(seg, "0123456789", "")) == 0)
        )
        return (
            host_col.startswith("host") & seg_digits
            & (F.pmod(seg.cast("bigint"), F.lit(5)) == 2)
        )

    def robots_blocked_col(self, host_col, path_col):
        """``path.startswith('/private/')`` on rule-bearing hosts — plain
        codegen expressions, equal to the python filter semantics over
        ``robots_disallow`` for every (host, path) (the rules list is
        ['/private/'] or []).  Withdraws with ``robots_col`` if a subclass
        overrides ``robots``."""
        if type(self).robots is not SynthWebAdapter.robots:
            return None
        # cheap conjunct first: startswith prunes every non-/private/ path
        # before the host decomposition runs (And short-circuits left to
        # right in both codegen and interpreted eval)
        return path_col.startswith("/private/") & self._robots_hit(host_col)


def robots_blocked(path: str, rules: list[str]) -> bool:
    """RFC 9309 §2.2.2 longest-match over encoded rules (``+`` = Allow):
    the longest matching prefix decides; an Allow of equal length beats a
    Disallow ("the least restrictive rule SHOULD be used").  With no Allow
    entries this is exactly "any disallow prefix matches" — the engine's
    original contract — so pure-disallow rule sets (the synthetic web, all
    pre-Allow tables) are bit-compatible.  The engine's JVM predicate
    (engine._filter_robots) mirrors this function; a divergence would split
    engine from oracle, so tests pin them equal over adversarial rules."""
    best_dis = max((len(r) for r in rules
                    if not r.startswith("+") and path.startswith(r)),
                   default=-1)
    best_alw = max((len(r) - 1 for r in rules
                    if r.startswith("+") and path.startswith(r[1:])),
                   default=-1)
    return best_dis > best_alw


def parse_links_and_images(body: bytes) -> tuple[list[str], int]:
    """Anchor hrefs + <img> count via the full DOM parser (recovery
    semantics: garbage bytes yield an empty result, never an exception)."""
    from mlscraper_spark.dom.parser import parse_html

    links: list[str] = []
    n_images = 0
    for rec in parse_html(body):
        if rec.tag == "a" and rec.attrs.get("href"):
            links.append(rec.attrs["href"])
        elif rec.tag == "img":
            n_images += 1
    return links, n_images


def parse_robots_txt(body: bytes, user_agent: str) -> list[str]:
    """Rule prefixes from a robots.txt body (``+``-encoded Allow, plain
    Disallow — ``robots_blocked`` is the matching predicate), REP group
    semantics:

    * lines are ``field: value`` with ``#`` comments; unknown fields and
      blank lines are ignored (blank lines do NOT close a group — rule
      lines do, per RFC 9309 §2.2.1's "groups are closed by a
      start-of-group line");
    * a group is one or more consecutive ``User-agent`` lines followed by
      its rules; a group applies to us when its agent token is ``*`` or a
      case-insensitive prefix of our product token (the part of
      ``user_agent`` before ``/``);
    * if any SPECIFIC group matches, only specific groups apply (the RFC's
      most-specific-match, flattened: our UA has one product token, so
      "specific beats *" is the whole ordering);
    * ``Disallow`` and ``Allow`` are both honored with RFC 9309 §2.2.2
      longest-match precedence (applied by ``robots_blocked``);
      ``Crawl-delay`` and other extensions are ignored, and ``*``/``$``
      wildcards inside a path are matched LITERALLY (documented subset —
      the engine's filter is prefix-match).  Empty value = no rule.
      Order is preserved, duplicates dropped.
    """
    product = user_agent.split("/")[0].strip().lower()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, rules)
    agents: list[str] = []
    in_agent_run = False
    for raw_line in body.decode("utf-8", "replace").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not in_agent_run:
                agents, in_agent_run = [], True
                groups.append((agents, []))
            agents.append(value.lower())
        else:
            in_agent_run = False
            if field == "disallow" and value and groups:
                groups[-1][1].append(value)
            elif field == "allow" and value and groups:
                groups[-1][1].append("+" + value)

    def _matches(agent: str) -> bool:
        return agent != "*" and product.startswith(agent)

    specific = [g for g in groups if any(_matches(a) for a in g[0])]
    chosen = specific or [g for g in groups if "*" in g[0]]
    out: list[str] = []
    for _, dis in chosen:
        for p in dis:
            if p not in out:
                out.append(p)
    return out


class HttpFetchAdapter(FetchAdapter):
    """Real-HTTP fetch: stdlib urllib GET with timeout/size caps.

    Semantics relative to the synthetic adapter, stated explicitly:

    * redirects are followed by the transport (urllib's default), so a
      moved page contributes its FINAL body at the original URL rather
      than a 301 row — the politeness budget still counts one fetch;
    * any transport-level failure (DNS, timeout, TLS) maps to status 599
      with an empty body — a non-200 like any other, so one dead host can
      never fail a task (same policy as the codec operators);
    * bodies are truncated at ``max_bytes`` (crawler memory bound);
    * link extraction uses the DOM parser, not synthweb's double-quote
      regex, because real HTML quotes hrefs every way.

    ``opener`` is injectable for tests (signature of
    ``urllib.request.urlopen``); default is the real network.
    """

    def __init__(self, timeout: float = 10.0,
                 user_agent: str = "mlscraper-spark/0.1",
                 max_bytes: int = 1 << 20, opener=None):
        self.timeout = timeout
        self.user_agent = user_agent
        self.max_bytes = max_bytes
        self._opener = opener

    def fetch(self, url_canon: str) -> tuple[int, bytes]:
        import urllib.error
        import urllib.request

        opener = self._opener or urllib.request.urlopen
        req = urllib.request.Request(
            url_canon, headers={"User-Agent": self.user_agent}
        )
        try:
            with opener(req, timeout=self.timeout) as resp:
                return int(getattr(resp, "status", 200)), resp.read(self.max_bytes)
        except urllib.error.HTTPError as e:
            return int(e.code), b""
        except Exception:
            return 599, b""  # transport failure: non-200, never a task error

    def response_meta(self, url_canon: str, status: int,
                      body: bytes) -> tuple[list[str], int]:
        if status != 200:
            return [], 0
        links, n_images = parse_links_and_images(body)
        # real HTML links relatively ('/a', '../b', 'c?d=1') — resolve
        # against the fetched URL (RFC 3986 join); the synthetic adapter
        # never needs this because synthweb emits absolute hrefs only.
        # An href urljoin rejects (e.g. 'http://[') is dropped like any
        # unparseable discovery, never a task error.
        from urllib.parse import urljoin

        resolved = []
        for href in links:
            try:
                resolved.append(urljoin(url_canon, href))
            except ValueError:
                pass
        return resolved, n_images

    def robots(self, host: str) -> list[str]:
        """GET ``/robots.txt`` through the same transport (same opener,
        timeout, size cap, 599-on-failure policy as ``fetch``) — https
        FIRST, falling back to http on any https non-200 (a modern site
        serves robots over 443 only; an http-only legacy host still gets
        its rules from the fallback).  Both non-200 — including 599
        transport failures — maps to "no rules" (allow-all): a
        missing/unreachable robots.txt must not stall the host, and a
        disallow-all fallback would silently starve every host behind a
        flaky robots endpoint.  The tradeoff is documented; a stricter
        deployment can subclass."""
        for scheme in ("https", "http"):
            status, body = self.fetch(f"{scheme}://{host}/robots.txt")
            if status == 200:
                return parse_robots_txt(body, self.user_agent)
        return []
