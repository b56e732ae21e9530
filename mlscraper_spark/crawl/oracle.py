"""Sequential oracle crawler — the executable spec (SURVEY.md §7.4).

Plain single-threaded Python.  The distributed Spark engine
(crawl/engine.py) must match this oracle *bit-for-bit* on (a) the fetch log
ordered by (epoch, seq) and (b) the final URL-seen set, under the same seed
list + politeness budget (BASELINE.json north_rule).

Epoch semantics (BSP):
  1. candidates = current frontier (never contains seen or robots-blocked
     URLs by construction);
  2. politeness is a per-host TOKEN BUCKET: capacity C
     (``tokens_capacity``, default = refill), refill R
     (``budget_per_host``) per epoch.  A host's available tokens this
     epoch = min(C, stored + R), where hosts absent from the store are
     full (stored = C - R ⇒ avail = C); take that many best candidates
     by (priority DESC, url_hash ASC, url_canon ASC); afterwards
     stored' = avail - fetched, and hosts whose NEXT avail would be C
     are dropped from the store (so with C == R — the default — the
     store is always empty and semantics reduce to the fixed per-epoch
     budget).  All arithmetic is integral ⇒ deterministic.
  3. global fetch order: all selected, sorted by the same total order;
     ``seq`` is the position in that order;
  4. fetch (pure function), extract links, canonicalize; discoveries enter
     the *next* epoch's frontier;
  5. frontier merge rule: per URL keep MIN depth, then MIN discovered epoch
     (associative — safe under any partitioning);
  6. priority = 1 / (1 + depth).

Robots: rules are a pure function of host, cached on first sight; blocked
URLs never enter the frontier.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from mlscraper_spark.crawl.synthweb import WebConfig, fetch, response_meta
from mlscraper_spark.crawl.urlnorm import (
    content_fp,
    host_of,
    try_canonicalize,
    url_hash,
)


def priority_of(depth: int) -> float:
    return 1.0 / (1.0 + depth)


@dataclass
class OracleState:
    frontier: dict = field(default_factory=dict)  # url_canon -> (depth, epoch)
    url_seen: set = field(default_factory=set)  # url_canon
    fetch_log: list = field(default_factory=list)
    robots_cache: dict = field(default_factory=dict)  # host -> (rules, epoch)
    host_tokens: dict = field(default_factory=dict)  # host -> tokens AFTER
    # consumption, BEFORE next refill; hosts at full-next-avail are absent


def _robots_blocked(url_canon: str, host: str, epoch: int, state: OracleState,
                    cfg: WebConfig) -> bool:
    if host not in state.robots_cache:
        state.robots_cache[host] = (cfg.robots_disallow(host), epoch)
    rules, _ = state.robots_cache[host]
    from urllib.parse import urlsplit

    from mlscraper_spark.crawl.fetchers import robots_blocked

    # shared predicate (RFC 9309 longest-match with '+'-encoded Allow) —
    # for the synthetic web's pure-disallow rules it equals the original
    # any(startswith) check bit-for-bit
    return robots_blocked(urlsplit(url_canon).path, rules)


def _insert(state: OracleState, url_canon: str, depth: int, epoch: int,
            cfg: WebConfig, max_depth: int | None = None,
            max_url_len: int | None = None) -> None:
    # crawler-trap guard FIRST: a trapped URL must not mark a host seen
    # nor trigger a robots fetch (the engine filters in the same order)
    if max_depth is not None and depth > max_depth:
        return
    if max_url_len is not None and len(url_canon) > max_url_len:
        return
    if url_canon in state.url_seen:
        return
    host = host_of(url_canon)
    if _robots_blocked(url_canon, host, epoch, state, cfg):
        return
    old = state.frontier.get(url_canon)
    if old is None:
        state.frontier[url_canon] = (depth, epoch)
    else:
        state.frontier[url_canon] = (min(old[0], depth), min(old[1], epoch))


def crawl_oracle(seeds: list[str], cfg: WebConfig, budget_per_host: int,
                 max_epochs: int, tokens_capacity: int | None = None,
                 max_depth: int | None = None,
                 max_url_len: int | None = None) -> OracleState:
    cap = tokens_capacity if tokens_capacity is not None else budget_per_host
    refill = budget_per_host
    assert cap >= refill >= 1, "capacity must be >= refill >= 1"
    state = OracleState()
    for s in seeds:
        cs = try_canonicalize(s)
        if cs is not None:  # unparseable seeds are dropped, like links
            _insert(state, cs, 0, 0, cfg, max_depth, max_url_len)

    for epoch in range(max_epochs):
        if not state.frontier:
            break
        # per-host politeness token bucket under the shared total order
        by_host: dict[str, list] = {}
        for url, (depth, disc) in state.frontier.items():
            by_host.setdefault(host_of(url), []).append(
                (-priority_of(depth), url_hash(url), url, depth)
            )
        selected = []
        consumed: dict[str, int] = {}
        for host, entries in by_host.items():
            avail = min(cap, state.host_tokens.get(host, cap) + refill) \
                if host in state.host_tokens else cap
            entries.sort()
            take = entries[:avail]
            selected.extend(take)
            consumed[host] = len(take)
        # refill every tracked host, consume where fetched, forget hosts
        # whose next avail is back at capacity
        next_tokens: dict[str, int] = {}
        for host in set(state.host_tokens) | set(consumed):
            avail = min(cap, state.host_tokens.get(host, cap) + refill) \
                if host in state.host_tokens else cap
            left = avail - consumed.get(host, 0)
            if min(cap, left + refill) < cap:
                next_tokens[host] = left
        state.host_tokens = next_tokens
        selected.sort()  # global fetch order

        for seq, (negp, uhash, url, depth) in enumerate(selected):
            status, html = fetch(url, cfg)
            links, n_images = response_meta(url, status, html, cfg)
            state.fetch_log.append(
                {
                    "epoch": epoch,
                    "seq": seq,
                    "url_canon": url,
                    "host": host_of(url),
                    "status": status,
                    "n_links": len(links),
                    "n_images": n_images,
                    "page_fp": content_fp(bytes(html))
                    if status == 200 else None,
                }
            )
            state.url_seen.add(url)
            del state.frontier[url]
            for raw in links:
                cu = try_canonicalize(raw)
                if cu is not None:  # unparseable hrefs are not links
                    _insert(state, cu, depth + 1, epoch + 1, cfg,
                            max_depth, max_url_len)
    return state
