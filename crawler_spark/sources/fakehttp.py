"""HTTP-shaped fake fetcher injected through the ``make_fetch_parse`` seam.

``operators/fetch.py`` documents the fetcher as the pluggable boundary
("a real deployment swaps make_fetch_parse's inner fetch_one for batched
HTTP") — this module proves the seam with a fetcher whose behavior is
HTTP-protocol-shaped and driven entirely by data: a url -> response
table carrying status codes, 3xx Location headers, per-attempt timeouts
and page bodies. No network, fully deterministic, picklable into the
``mapInPandas`` closure — so the SAME object drives both the Spark
engine and the sequential :class:`~crawler_spark.plans.oracle.OracleCrawler`,
and the crawl-ordering / URL-seen exact-match gate applies unchanged
(reference analog: the requests/Selenium session the reference wraps in
src/crawler/crawler.py:30; retry loop base_crawler.py:232-284).

Protocol semantics implemented:
  * 200 + ``links``          -> HTML page; hrefs in document order
  * 200 + ``payload_seed``   -> image response (input_hint payload row)
  * 3xx + ``location``       -> followed client-side like
                                ``requests.get(..., allow_redirects=True)``,
                                with loop detection and a hop budget —
                                the fetch surfaces the TERMINAL page's
                                content under the requested URL
  * 4xx/5xx                  -> failure ``http_<status>`` every attempt
  * ``fail_attempts=k``      -> connect timeout on attempts 1..k, success
                                after — the T3 bounded-retry path
  * absent URL               -> ``http_404`` (dead link / NXDOMAIN)

The single-hop 3xx edges are also exposed as :meth:`redirect_edges` for
the batch resolver ``operators/graph.resolve_redirects`` — tests assert
the pointer-doubling resolver agrees with this client-side chase on
every chain, including cycles and over-budget chains.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from crawler_spark.functions.canon import normalize_url
from crawler_spark.functions.codecs import encode, phash64
from crawler_spark.functions.xxh import xxh64_str


@dataclass(frozen=True)
class HttpResponse:
    """One URL's canned HTTP behavior."""

    status: int = 200
    location: str | None = None        # 3xx Location header
    links: tuple[str, ...] = ()        # hrefs of a 200 HTML body
    payload_seed: int | None = None    # 200 image body (deterministic)
    fail_attempts: int = 0             # connect timeouts before success


@dataclass
class FakeHttpWeb:
    """Duck-type of :class:`~crawler_spark.sources.synth.SynthWeb` —
    same six-method fetcher interface, so ``run_crawl``/``run_round``,
    ``init_crawl`` and ``OracleCrawler`` accept it unmodified."""

    responses: dict[str, HttpResponse] = field(default_factory=dict)
    seeds: tuple[str, ...] = ()
    robots: tuple[dict, ...] = ()
    max_redirects: int = 8

    def __post_init__(self):
        self.responses = {
            normalize_url(u): r for u, r in self.responses.items()
        }

    # ---- crawl bootstrap ------------------------------------------------
    def seeds_raw(self) -> list[str]:
        return list(self.seeds)

    def robots_rows(self) -> list[dict]:
        return [dict(r) for r in self.robots]

    # ---- the HTTP client ------------------------------------------------
    def _resolve(self, url_canon: str) -> tuple[str | None, str | None]:
        """Chase the 3xx chain exactly like an HTTP client with
        ``allow_redirects``: (final_url, None) on success, (None,
        reason) for a dead link, a Location loop, or a chain longer
        than ``max_redirects``."""
        chain = {url_canon}
        cur = url_canon
        for _ in range(self.max_redirects + 1):
            r = self.responses.get(cur)
            if r is None:
                return None, "http_404"
            if 300 <= r.status < 400:
                nxt = normalize_url(r.location or "")
                if nxt in chain:
                    return None, "redirect_loop"
                chain.add(nxt)
                cur = nxt
                continue
            return cur, None
        return None, "too_many_redirects"

    def fetch_error(self, url_canon: str, attempt: int = 1) -> str | None:
        final, err = self._resolve(url_canon)
        if err is not None:
            return err
        r = self.responses[final]
        if r.status >= 400:
            return f"http_{r.status}"
        if attempt <= r.fail_attempts:
            return "connect_timeout"
        return None

    def is_leaf(self, url_canon: str) -> bool:
        final, err = self._resolve(url_canon)
        return err is None and self.responses[final].payload_seed is not None

    def outlinks_raw(self, url_canon: str) -> list[str]:
        final, err = self._resolve(url_canon)
        if err is not None or self.responses[final].payload_seed is not None:
            return []
        return list(self.responses[final].links)

    def payload(self, url_canon: str) -> dict:
        """input_hint payload derived from the TERMINAL page (a redirect
        serves the target's bytes under the requested URL — duplicate
        content, exactly what image-dedup exists for)."""
        final, err = self._resolve(url_canon)
        assert err is None and self.responses[final].payload_seed is not None
        seed = int(self.responses[final].payload_seed)
        h = xxh64_str(final) & 0xFFFFFFFFFFFFFFFF
        rng = np.random.default_rng(seed)
        w, hh = (32, 64) if h & 1 else (64, 32)
        fmt = "png" if (h >> 2) & 1 else "qdct"
        px = rng.integers(0, 256, size=(hh, w), dtype=np.uint8)
        return {
            "image_id": f"img-{seed:016x}",
            "bytes": encode(px, fmt),
            "w": int(w),
            "h": int(hh),
            "fmt": fmt,
            "caption": f"caption img-{seed:016x}",
            "phash": phash64(px),
        }

    def pixels(self, url_canon: str) -> np.ndarray:
        final, _ = self._resolve(url_canon)
        seed = int(self.responses[final].payload_seed)
        h = xxh64_str(final) & 0xFFFFFFFFFFFFFFFF
        rng = np.random.default_rng(seed)
        w, hh = (32, 64) if h & 1 else (64, 32)
        return rng.integers(0, 256, size=(hh, w), dtype=np.uint8)

    # ---- redirect graph export -----------------------------------------
    def redirect_edges(self) -> list[tuple[str, str]]:
        """Every single-hop 3xx edge (src, Location) — the input shape
        of ``operators/graph.resolve_redirects``."""
        return [
            (u, normalize_url(r.location or ""))
            for u, r in sorted(self.responses.items())
            if 300 <= r.status < 400
        ]
