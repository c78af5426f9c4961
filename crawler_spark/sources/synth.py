"""Deterministic synthetic web — the test fixture universe.

The reference crawls a 3-level administrative hierarchy (province ->
district -> dong; reference: src/crawler/crawler.py:1204-1334) and each
leaf yields a result list. Our synthetic web mirrors that shape:

  http://host-i.test/            depth 0 (root, like the region page)
  http://host-i.test/p{j}        depth 1 (province)
  http://host-i.test/p{j}/d{k}   depth 2 (district)
  http://host-i.test/p{j}/d{k}/img-{m}   depth 3 leaf: image+caption page

Everything is a pure function of the URL string (via XXH64), so the Spark
fetch stage (executors) and the sequential oracle (driver) see the same
web without sharing state. Outlinks are emitted in *messy* raw form
(uppercase host, :80 port, /./ segments, fragments) to exercise RFC 3986
canonicalization, exactly like FIXTURES.md §2 specifies.

Scale points (FIXTURES.md §7): t1-smoke / t2-correctness (one skewed
mega-host) / bench (zipf-skewed hosts).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from crawler_spark.functions.codecs import encode, phash64
from crawler_spark.functions.xxh import xxh64_str

_ADJ = ["amber", "bright", "calm", "dusty", "early", "faded", "grand", "hazy"]
_NOUN = ["bridge", "canyon", "dune", "forest", "harbor", "island", "jetty", "meadow"]


def _uh(s: str) -> int:
    """Unsigned 64-bit hash of a string (engine+oracle shared)."""
    return xxh64_str(s) & 0xFFFFFFFFFFFFFFFF


# coordinate grids for the 4 (h, w) payload shapes, built once per
# process: np.mgrid per fetch was ~25% of payload() time, for grids
# that only ever take four values
_GRID_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _grids(hh: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    g = _GRID_CACHE.get((hh, w))
    if g is None:
        yy, xx = np.mgrid[0:hh, 0:w]
        g = (yy, xx)
        _GRID_CACHE[(hh, w)] = g
    return g


# base-pattern cache: the structured layer is a pure function of
# (mult_x 1-7, mult_y 1-5, shape in 4 values) — at most 140 distinct
# 4 KB arrays per process, vs recomputing the modular ramp every fetch
_BASE_CACHE: dict[tuple[int, int, int, int], np.ndarray] = {}


def _base_pattern(mx: int, my: int, hh: int, w: int) -> np.ndarray:
    b = _BASE_CACHE.get((mx, my, hh, w))
    if b is None:
        yy, xx = _grids(hh, w)
        b = ((xx * mx + yy * my) % 256).astype(np.uint8)
        _BASE_CACHE[(mx, my, hh, w)] = b
    return b


@dataclass(frozen=True)
class SynthWeb:
    n_hosts: int = 3
    max_p: int = 3  # max provinces per host (depth-1 fanout)
    max_d: int = 3  # max districts per province (depth-2 fanout)
    max_img: int = 4  # max images per district (leaf fanout)
    mega_host: int | None = None  # this host gets mega_mult x leaf fanout
    mega_mult: int = 8
    fail_mod: int = 23  # leaf urls with uh % fail_mod == 0 fail to fetch
    # transient failures: leaf urls with uh % flaky_mod == 1 fail on
    # attempt 1 and succeed from attempt 2 (0 = no flaky urls)
    flaky_mod: int = 0
    # deep chain mode: instead of the 3-level hierarchy, each host is a
    # tree of /x{j} directories ``deep_levels`` deep with fanout 1-2 per
    # level, leaves below. Exercises orderings that the positional-radix
    # discovery_seq encoding could NOT represent (12 bits/level -> int64
    # overflow at depth >= 6); the dense counter must handle any depth.
    deep_levels: int = 0
    # spider-trap mode: this host's root ALSO links into /cal/2024, and
    # every /cal/... page links one level deeper (/cal/2024/2024/...)
    # FOREVER — the classic calendar trap. An ungated crawl never
    # drains on this host; the pathological-path gate must cut it.
    trap_host: int | None = None

    # ---- structure ----------------------------------------------------
    def host(self, i: int) -> str:
        return f"host-{i}.test"

    def root(self, i: int) -> str:
        return f"http://{self.host(i)}/"

    def seeds_raw(self) -> list[str]:
        """Messy seed list: canonicalization must collapse these to roots."""
        out = []
        for i in range(self.n_hosts):
            h = self.host(i)
            variant = i % 4
            if variant == 0:
                out.append(f"http://{h.upper()}:80/#top")
            elif variant == 1:
                out.append(f"http://{h}/a/../")
            elif variant == 2:
                out.append(f"http://{h}/./")
            else:
                out.append(f"http://{h}/")
        return out

    def _fanout(self, key: str, lo: int, hi: int) -> int:
        return lo + _uh(key) % max(hi - lo + 1, 1)

    def depth(self, url_canon: str) -> int:
        path = url_canon.split("://", 1)[1].split("/", 1)
        segs = [s for s in (path[1] if len(path) > 1 else "").split("/") if s]
        return len(segs)

    def is_leaf(self, url_canon: str) -> bool:
        return "/img-" in url_canon

    def outlinks_raw(self, url_canon: str) -> list[str]:
        """Raw (messy) outlinks of a non-leaf page, in document order."""
        if self.is_leaf(url_canon):
            return []
        hostpart = url_canon.split("://", 1)[1]
        host, _, path = hostpart.partition("/")
        segs = [s for s in path.split("/") if s]
        base = f"http://{host}"
        d = len(segs)
        links: list[str] = []
        host_idx_s = host.split("-")[1].split(".")[0] if "-" in host else ""
        if (
            self.trap_host is not None
            and host_idx_s == str(self.trap_host)
            and segs
            and segs[0] == "cal"
        ):
            # the calendar trap: always exactly one link, one level deeper
            return [f"{base}/{'/'.join(segs)}/2024"]
        if self.deep_levels:
            prefix = "/".join(segs)
            stem = f"{base}/{prefix}" if prefix else base
            if d < self.deep_levels:
                n = self._fanout(f"{host}|{prefix}|x", 1, 2)
                for j in range(n):
                    u = f"{stem}/x{j}"
                    if j % 3 == 1:
                        u += "#frag"  # messy form; canon must strip it
                    links.append(u)
            else:
                n = self._fanout(f"{host}|{prefix}|m", 1, self.max_img)
                for m in range(n):
                    links.append(f"{stem}/img-{m}")
            return links
        if d == 0:
            if self.trap_host is not None and host_idx_s == str(self.trap_host):
                links.append(f"{base}/cal/2024")
            n = self._fanout(f"{host}|p", 2, self.max_p)
            for j in range(n):
                # document order == sibling index order (reference keeps
                # DOM order; crawler.py:237-245)
                mess = j % 3
                u = f"{base}/p{j}"
                if mess == 1:
                    u = f"http://{host.upper()}/p{j}#s"
                elif mess == 2:
                    u = f"{base}/./p{j}"
                links.append(u)
        elif d == 1:
            n = self._fanout(f"{host}|{segs[0]}|d", 2, self.max_d)
            for k in range(n):
                links.append(f"{base}/{segs[0]}/d{k}")
        elif d == 2:
            n = self._fanout(f"{host}|{segs[0]}|{segs[1]}|m", 1, self.max_img)
            host_idx = int(host.split("-")[1].split(".")[0])
            if self.mega_host is not None and host_idx == self.mega_host:
                n *= self.mega_mult
            for m in range(n):
                links.append(f"{base}/{segs[0]}/{segs[1]}/img-{m}")
        return links

    # ---- fetch behavior ------------------------------------------------
    def fetch_error(
        self, url_canon: str, attempt: int = 1, uh: int | None = None
    ) -> str | None:
        """Deterministic failure injection (reference analog: session
        errors retried by base_crawler.py:33,232-284 — up to 2 attempts).

        Permanent failures fail every attempt; flaky ones fail only
        attempt 1, modeling the transient resets a real crawl hits
        constantly. ``uh``, when given, must equal ``_uh(url_canon)``
        (the fetch stage shares one hash across routing + payload)."""
        if not self.is_leaf(url_canon):
            return None
        h = _uh(url_canon) if uh is None else uh
        if h % self.fail_mod == 0:
            return "synthetic_timeout"
        if self.flaky_mod and attempt < 2 and h % self.flaky_mod == 1:
            return "synthetic_reset"
        return None

    def payload(self, url_canon: str, uh: int | None = None) -> dict:
        """Leaf page payload per input_hint schema: image + caption.

        ``uh`` lets the fetch stage pass the URL hash it already computed
        for failure routing, saving one xxh64 per fetched leaf; semantics
        are unchanged (it must equal ``_uh(url_canon)``).
        """
        h = _uh(url_canon) if uh is None else uh
        rng = np.random.default_rng(h)
        w = 32 if h & 1 else 64
        hh = 32 if (h >> 1) & 1 else 64
        fmt = "png" if (h >> 2) & 1 else "qdct"
        # structured pattern + noise so phash is meaningful. noise < 32,
        # so uint8 addition's mod-256 wraparound IS the old
        # (uint16 + noise) % 256 — one allocation instead of three.
        base = _base_pattern((h >> 3) % 7 + 1, (h >> 6) % 5 + 1, hh, w)
        noise = rng.integers(0, 32, size=(hh, w), dtype=np.uint8)
        px = base + noise
        hx = f"{h:016x}"
        caption = (
            f"caption img-{hx} {_ADJ[h % len(_ADJ)]} "
            f"{_NOUN[(h >> 8) % len(_NOUN)]}"
        )
        return {
            "image_id": f"img-{hx}",
            "bytes": encode(px, fmt),
            "w": int(w),
            "h": int(hh),
            "fmt": fmt,
            "caption": caption,
            "phash": phash64(px),
        }

    def pixels(self, url_canon: str) -> np.ndarray:
        """Ground-truth pixels (for PSNR checks in tests)."""
        h = _uh(url_canon)
        rng = np.random.default_rng(h)
        w = 32 if h & 1 else 64
        hh = 32 if (h >> 1) & 1 else 64
        base = _base_pattern((h >> 3) % 7 + 1, (h >> 6) % 5 + 1, hh, w)
        noise = rng.integers(0, 32, size=(hh, w), dtype=np.uint8)
        return base + noise

    # ---- robots --------------------------------------------------------
    def robots_txt(self, host: str) -> str:
        """The host's robots.txt body — the raw-text form of
        :meth:`robots_rows` (functions/robots.py parses one back into
        the other; tests assert the round-trip)."""
        row = next(r for r in self.robots_rows() if r["host"] == host)
        lines = ["# synthetic robots.txt", "User-agent: *"]
        for p in row["deny_prefixes"]:
            lines.append(f"Disallow: {p}")
        lines.append(f"Crawl-delay: {row['crawl_delay_s']}")
        return "\n".join(lines) + "\n"

    def robots_rows(self) -> list[dict]:
        """Per-host robots dimension (broadcast-joined; reference analog:
        the consent/filter-popup gate, crawler.py:65-117, and
        CRAWL_DELAY config.py:49)."""
        rows = []
        for i in range(self.n_hosts):
            host = self.host(i)
            h = _uh(host)
            delay = [0.5, 1.0, 2.0][h % 3]
            deny: list[str] = []
            if h % 7 == 0:
                deny.append("/p1")  # partial deny
            if i == self.n_hosts - 1 and self.n_hosts > 3:
                deny.append("/")  # fully-denied host
            rows.append(
                {
                    "host": host,
                    "deny_prefixes": deny,
                    "crawl_delay_s": delay,
                }
            )
        return rows


# canonical scale points (FIXTURES.md §7)
T1_SMOKE = SynthWeb(n_hosts=3)
T2_CORRECTNESS = SynthWeb(
    n_hosts=10, max_p=4, max_d=4, max_img=6, mega_host=0, mega_mult=10
)
# depth-9 chains x 16 seeds: the old positional-radix discovery_seq
# (12 bits/level) would need >100 bits here; the dense counter must stay
# small and keep exact oracle ordering
T3_DEEP = SynthWeb(n_hosts=16, deep_levels=8, max_img=2)
# transient-failure web: ~1/5 of leaves fail their first attempt and
# must be re-queued (T3 retry budget); fail_mod leaves stay permanent
T4_FLAKY = SynthWeb(n_hosts=6, max_p=3, max_d=3, max_img=5, flaky_mod=5)
# calendar-trap web: host-1's root links into an INFINITE /cal/2024/...
# chain; an ungated crawl never drains on it (bounded only by
# max_rounds), the pathological-path gate must cut it and still match
# the oracle exactly
T5_TRAP = SynthWeb(n_hosts=4, max_p=3, max_d=3, max_img=4, trap_host=1)
BENCH = SynthWeb(n_hosts=50, max_p=6, max_d=8, max_img=25, mega_host=0, mega_mult=12)
