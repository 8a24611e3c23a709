"""Crawl configuration — every knob that crawl order depends on.

Crawl order and the final URL-seen set are pure functions of
(seed list, CrawlConfig) — never of parallelism (SURVEY.md §3.2.4,
BASELINE.json:6 "reproduce ... crawl ordering and final URL-seen set
exactly").
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    """Parameters of a deterministic crawl.

    Attributes:
        seed: master RNG seed driving the synthetic web graph
            (FIXTURES.md §B.1) — a real HTTP fetcher ignores it.
        budget: politeness budget B — max fetches per host per wave
            (BASELINE.json:6 "per-domain politeness budgets").
        max_depth: terminate when wave == max_depth (depth <= wave, BFS).
        max_urls: global cap on assigned crawl ranks.
        n_hosts: host-universe size of the synthetic graph.
        link_bound: L in the seq formula — max refs per page bound;
            link/image ref j on the page with global rank r gets
            seq = (r + 1) * L + j, seeds get seq = 0..n_seeds-1
            (SURVEY.md §3.2.3; the +1 keeps link seqs disjoint from
            seed seqs so the total order needs no collision handling).
        num_shards: K — number of seen-set shards, range-partitioned by
            host_hash (BASELINE.json:6 "range-partitioned by host-hash").
        allowed_suffixes: host allowlist (scope filter M6).
        fetch_batch_size / image_batch_size / fetch_concurrency:
            physical sizing only — MUST NOT affect crawl order.
    """

    seed: int = 42
    budget: int = 8
    max_depth: int = 6
    max_urls: int = 100_000
    n_hosts: int = 50
    link_bound: int = 1 << 20
    num_shards: int = 8
    allowed_suffixes: tuple[str, ...] = (".test",)
    zipf_alpha: float = 1.1
    max_links_per_page: int = 12
    image_sizes: tuple[int, ...] = (32, 48, 64, 96, 128)  # synthetic-universe knob
    # formats pages embed (synthetic-universe knob, like image_sizes).
    # Default = the three lossless codecs (keeps the crawl output hash
    # stable across rounds); add "ldt" to exercise the lossy DCT codec
    # and the real PSNR >= 40 dB fidelity gate (BASELINE.json:15).
    image_formats: tuple[str, ...] = ("raw", "ppm", "png")

    # physical knobs (order-neutral)
    # driver fast-path budgets: waves whose candidate / combined-ref
    # column sets fit under these row counts are finalized with numpy on
    # the driver (pruned columns only); larger waves use the distributed
    # groupby/sort paths. Both paths are exact and order-identical.
    driver_select_max: int = 5_000_000
    driver_dedup_max: int = 5_000_000
    fetch_batch_size: int = 256
    image_batch_size: int = 128
    # round-3 sweep on the 500k headline crawl (quiesced): 4096 -> 35.5 s,
    # 16384 -> 28.5 s, 65536 -> 29.4 s; bigger admit calls amortize the
    # per-RPC overhead until actor-side latency stops overlapping.
    # Results are batch-size-independent (admits are exact per key).
    dedup_batch_size: int = 16384
    fetch_concurrency: int = 4
    num_partitions: int = 16
    # hot-domain splitting (SURVEY.md §4.3.2): a host whose per-wave
    # candidate count exceeds this gets its top-B selection split
    # round-robin across num_partitions sub-groups (distributed
    # selection path only — the driver fast path is already one task).
    # Order-neutral: the split is a pure function of (count, seq).
    hot_host_threshold: int = 10_000
    # wall-clock politeness pacing (SURVEY.md §2.8): min seconds between
    # fetch STARTS per host, enforced globally by a reservation actor.
    # 0 = off. Order-neutral by construction: the admitted set and rank
    # order are fixed before the fetch stage runs.
    politeness_delay_s: float = 0.0
    # incremental frontier: waves append a new-links SEGMENT and filter
    # previously-admitted rows lazily (per-wave checkpoint IO ∝ new
    # links). Compaction physically rebuilds the pending set into one
    # segment and resets the filter chain when EITHER compact_every
    # waves elapsed OR the dead-row share of the view exceeds
    # compact_dead_frac (adaptive: small crawls with high per-wave
    # admit ratios compact often — scans stay lean; a 10^10 frontier
    # admits a tiny fraction per wave, so checkpoints stay deltas).
    # Order-neutral: the filtered union IS the deferred frontier.
    compact_every: int = 8
    compact_dead_frac: float = 0.15

    def priority(self, depth: int) -> int:
        """Pluggable priority function (SURVEY.md §2 op U2); default 0:
        pure (seq)-ordered BFS within a host."""
        return 0


DEFAULT_CONFIG = CrawlConfig()


def seed_urls(cfg: CrawlConfig, n_seeds: int) -> list[str]:
    """Deterministic seed list fixture (FIXTURES.md §B.1)."""
    return [f"http://h{i % cfg.n_hosts}.test/s/{i}" for i in range(n_seeds)]
