"""Sequential reference-semantics oracle.

A single-threaded simulator of the crawl with EXACTLY the engine's
ordering contract — the analog of the reference's nested-loop crawl
(reference: src/crawler/crawler.py:1204-1334): pending URLs visited in
``(priority, depth, discovery_seq, url_hash)`` order under the same
per-host politeness budget, robots gate, failure injection and
first-discovery-wins frontier dedup. The Spark engine must reproduce this
simulator's per-round schedule (as an ordered list) and final URL-seen
set bit-for-bit (BASELINE.json north_rule).

Pure Python + the shared SynthWeb / normalize_url / xxh64, so it runs
without a JVM and is obviously-correct by inspection.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from crawler_spark.functions.canon import normalize_url
from crawler_spark.functions.xxh import xxh64_str
from crawler_spark.sources.synth import SynthWeb


@dataclass(order=True)
class _Entry:
    priority: int
    depth: int
    discovery_seq: int
    url_hash: int
    url_canon: str = field(compare=False)
    host: str = field(compare=False)
    attempts: int = field(default=0, compare=False)
    born_round: int = field(default=0, compare=False)


def _entry(
    url_canon: str, priority: int, depth: int, seq: int, born_round: int = 0
) -> _Entry:
    host = url_canon.split("://", 1)[1].split("/", 1)[0].split(":")[0]
    return _Entry(
        priority, depth, seq, xxh64_str(url_canon), url_canon, host,
        born_round=born_round,
    )


class OracleCrawler:
    def __init__(
        self,
        web: SynthWeb,
        seeds_raw: list[str] | None = None,
        round_seconds: float = 16.0,
        max_attempts: int = 2,
        host_priorities: dict[str, int] | None = None,
        adaptive: bool = False,
        aging_every: int | None = None,
        max_pages_per_host: int | None = None,
        politeness_by: str = "host",
        n_ips: int = 4,
        trap_max_seg_repeat: int | None = None,
    ):
        self.web = web
        self.round_seconds = round_seconds
        self.max_attempts = max_attempts
        # cumulative host quota (Heritrix host-quota analog): a host
        # that has consumed `max_pages_per_host` schedule SLOTS over the
        # whole crawl (retries count — each slot is a fetch) never
        # schedules again; its rows stay pending and the loop drains.
        self.quota = max_pages_per_host
        self.host_served: dict[str, int] = {}
        # Mercator shared-IP politeness mirror (run_round politeness_by):
        # ip = xxhash64(host) pmod n_ips; budget per IP = min of its
        # member hosts' budgets among hosts pending this round
        self.politeness_by = politeness_by
        self.n_ips = n_ips
        # OPIC-style priority queue hook: lower value schedules first;
        # hosts absent from the map crawl at priority 0 (the default
        # FIFO-by-discovery behavior the reference exhibits)
        self.prio = host_priorities or {}
        # closed-loop politeness mirror: hosts that failed a fetch in the
        # previous round crawl at half budget this round (floor, min 1)
        self.adaptive = adaptive
        # starvation-free priority aging mirror (run_round aging_every):
        # effective priority this round = max(0, priority -
        # (round - born_round) // aging_every)
        self.aging_every = aging_every
        self.failed_hosts_prev: set[str] = set()
        # pathological-path trap gate mirror (run_round
        # trap_max_seg_repeat): a pending URL repeating one path segment
        # this many times is terminally trapped, never scheduled
        self.trap_thr = trap_max_seg_repeat
        self.trapped: list[str] = []
        self.robots = {r["host"]: r for r in web.robots_rows()}
        self.pending: list[_Entry] = []
        self.seen: set[str] = set()
        self.schedule: list[tuple[int, str]] = []  # (round, url) in order
        self.results: list[str] = []
        self.failures: list[tuple[str, str]] = []
        self.denied: list[str] = []
        seeds = seeds_raw if seeds_raw is not None else web.seeds_raw()
        for i, raw in enumerate(seeds):
            c = normalize_url(raw)
            if c not in self.seen:
                self.seen.add(c)
                self.pending.append(_entry(c, self._prio_of(c), 0, i))
        # global dense discovery counter: every URL's discovery_seq is its
        # encounter order, exactly what a sequential crawler's pending
        # list encodes — bounded by the URL count, so int64-safe at any
        # depth (the old parent_seq*4096+i positional radix was not)
        self.next_seq = (
            max(e.discovery_seq for e in self.pending) + 1 if self.pending else 0
        )

    def _prio_of(self, url_canon: str) -> int:
        host = url_canon.split("://", 1)[1].split("/", 1)[0].split(":")[0]
        return self.prio.get(host, 0)

    def _budget(self, host: str) -> int:
        delay = self.robots.get(host, {}).get("crawl_delay_s", 1.0)
        return max(1, math.floor(self.round_seconds / delay))

    def _is_denied(self, e: _Entry) -> bool:
        deny = self.robots.get(e.host, {}).get("deny_prefixes", [])
        path = "/" + e.url_canon.split("://", 1)[1].split("/", 1)[1] if "/" in e.url_canon.split("://", 1)[1] else "/"
        return any(path.startswith(p) for p in deny)

    def reprioritize(self, host_priorities: dict[str, int] | None) -> None:
        """Mid-crawl priority-map REPLACEMENT (mirror of
        plans/rounds.reprioritize): every pending entry is re-keyed to
        the new map, hosts absent from it falling back to priority 0 —
        the same rule new discoveries get from ``_prio_of``."""
        self.prio = dict(host_priorities or {})
        for e in self.pending:
            e.priority = self._prio_of(e.url_canon)

    def run_round(self, round_id: int, target_host_contains: str | None = None) -> int:
        def eff(e: _Entry) -> int:
            if not self.aging_every:
                return e.priority
            return max(
                0, e.priority - (round_id - e.born_round) // self.aging_every
            )

        self.pending.sort(
            key=lambda e: (eff(e), e.depth, e.discovery_seq, e.url_hash)
        )
        # F9 targeting: only pending rows whose host matches proceed this
        # round; the rest stay pending untouched (engine: frontier
        # pre-filter in run_round)
        if target_host_contains is not None:
            held = [e for e in self.pending if target_host_contains not in e.host]
            self.pending = [e for e in self.pending if target_host_contains in e.host]
        else:
            held = []
        if self.trap_thr is not None:
            from collections import Counter

            kept: list[_Entry] = []
            for e in self.pending:
                rest = e.url_canon.split("://", 1)[1]
                path = rest.split("/", 1)[1] if "/" in rest else ""
                segs = [s for s in path.split("/") if s]
                if segs and max(Counter(segs).values()) >= self.trap_thr:
                    self.trapped.append(e.url_canon)
                else:
                    kept.append(e)
            self.pending = kept
        # robots gate over the round's pending rows (engine applies the
        # broadcast join to the whole targeted pending set each round)
        alive: list[_Entry] = []
        for e in self.pending:
            if self._is_denied(e):
                self.denied.append(e.url_canon)
            else:
                alive.append(e)
        taken: list[_Entry] = []
        deferred: list[_Entry] = []
        used: dict[str, int] = {}

        def _round_budget(host: str) -> int:
            b = self._budget(host)
            if self.adaptive and host in self.failed_hosts_prev:
                b = max(1, b // 2)
            if self.quota is not None:
                b = min(b, max(0, self.quota - self.host_served.get(host, 0)))
            return b

        if self.politeness_by == "ip":
            # shared-IP admission: Python % matches Spark pmod for a
            # positive modulus, and xxh64_str matches xxhash64 exactly
            def _key(e: _Entry) -> object:
                return xxh64_str(e.host) % self.n_ips

            ipb: dict[object, int] = {}
            for e in alive:
                k, b = _key(e), _round_budget(e.host)
                ipb[k] = min(ipb.get(k, b), b)

            def _bud(e: _Entry) -> int:
                return ipb[_key(e)]

        else:
            def _key(e: _Entry) -> object:
                return e.host

            _bud = lambda e: _round_budget(e.host)  # noqa: E731
        for e in alive:
            k = _key(e)
            if used.get(k, 0) < _bud(e):
                used[k] = used.get(k, 0) + 1
                taken.append(e)
            else:
                deferred.append(e)
        self.pending = deferred
        failed_hosts_now: set[str] = set()
        for e in taken:
            self.schedule.append((round_id, e.url_canon))
            self.host_served[e.host] = self.host_served.get(e.host, 0) + 1
            err = self.web.fetch_error(e.url_canon, attempt=e.attempts + 1)
            if err is not None:
                failed_hosts_now.add(e.host)
                # T3 retry budget: re-queue (next round, same ordering
                # key) below the budget; terminal failure at the budget
                if e.attempts + 1 < self.max_attempts:
                    self.pending.append(
                        _Entry(
                            e.priority, e.depth, e.discovery_seq, e.url_hash,
                            e.url_canon, e.host, e.attempts + 1, e.born_round,
                        )
                    )
                else:
                    self.failures.append((e.url_canon, err))
                continue
            if self.web.is_leaf(e.url_canon):
                self.results.append(e.url_canon)
                continue
            for raw in self.web.outlinks_raw(e.url_canon):
                c = normalize_url(raw)
                if c not in self.seen:
                    self.seen.add(c)
                    self.pending.append(
                        _entry(
                            c, self._prio_of(c), e.depth + 1, self.next_seq,
                            born_round=round_id,
                        )
                    )
                    self.next_seq += 1
        self.pending.extend(held)
        self.failed_hosts_prev = failed_hosts_now
        return len(taken)

    def run(
        self,
        max_rounds: int = 32,
        stop_on_caption_contains: str | None = None,
    ) -> None:
        """Round loop; with ``stop_on_caption_contains``, halts after the
        first round that lands a matching result (stop-on-found,
        reference: crawler.py:1149-1157)."""
        for r in range(1, max_rounds + 1):
            n_before = len(self.results)
            took = self.run_round(r)
            if stop_on_caption_contains is not None:
                new = self.results[n_before:]
                if any(
                    stop_on_caption_contains in self.web.payload(u)["caption"]
                    for u in new
                ):
                    break
            if took == 0:
                break
