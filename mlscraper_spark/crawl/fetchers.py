"""Pluggable fetch adapters for the crawl engine's Arrow fetch stage.

The BSP epoch loop is fetch-agnostic: ``engine._fetch_udf`` talks to an
adapter's two methods and nothing else, so swapping what "fetch" means
never touches frontier/politeness/seen-check/snapshot logic:

* ``fetch(url_canon) -> (status, body_bytes)``
* ``response_meta(url_canon, status, body) -> (raw_hrefs, n_images)``

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


@dataclass(frozen=True)
class SynthWebAdapter(FetchAdapter):
    """The deterministic synthetic web (default; oracle-pinned)."""

    web: WebConfig

    def fetch(self, url_canon: str) -> tuple[int, bytes]:
        return fetch(url_canon, self.web)

    def response_meta(self, url_canon: str, status: int,
                      body: bytes) -> tuple[list[str], int]:
        return response_meta(url_canon, status, body, self.web)


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
        return parse_links_and_images(body)
