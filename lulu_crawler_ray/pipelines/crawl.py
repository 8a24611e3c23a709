"""The flagship crawl — Ray-Data wave loop (SURVEY.md §3.1/§1.3).

Within a wave, one streaming Dataset pipeline (selection -> sort+rank ->
fetch -> parse -> link/image branches) runs fully pipelined; the wave
boundary is the only barrier and is what makes crawl order a pure,
parallelism-independent function of (seed list, config) —
BASELINE.json:6 "reproduce ... crawl ordering and final URL-seen set
exactly". The semantics are documented in pipelines/oracle.py (the
executable spec); this module is the distributed implementation.

Checkpoint layout (SURVEY.md §4.4; BASELINE.json:6 "every partition
checkpoints its frontier, cuckoo-filter shards, and fetch lineage so a
killed job resumes mid-crawl with identical downstream state"):

    out/ckpt/enter_wave=NNNN/frontier/*.parquet   frontier SEGMENT: the
        new-links delta of wave N-1 (or the compacted pending set on a
        compaction wave) — per-wave checkpoint IO ∝ new links
    out/ckpt/enter_wave=NNNN/admitted.parquet     admitted-seq filter
        delta (absent on compaction waves — the chain resets)
    out/ckpt/enter_wave=NNNN/shards/shard-K.bin   seen-set shard dumps
    out/ckpt/enter_wave=NNNN/manifest.json        written LAST = seal;
        lists the live segment + admitted-file paths
    out/ledger/wave=NNNN/*.parquet                T4 crawl order
    out/waves/wave=NNNN/...                       T3 image rows (Lance/Parquet)

The PENDING frontier is the union of the live segments minus the
admitted filter chain (applied lazily inside the selection scan);
compaction (periodic or when the dead-row share exceeds
cfg.compact_dead_frac) physically rebuilds it into one segment. Resume
= restore shards + segments + filter chain from the last sealed
enter_wave manifest and re-run from that wave; output dirs of the
interrupted wave are deleted first, and rank assignment recomputes
identically (SURVEY.md §3.3 wave-granular idempotence).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import CrawlConfig
from ..sources.image_table import write_images
from ..state.metrics import MetricsActor
from ..state.seen import make_shards
from ..stages import crawl_stages as st
from .. import schemas

_LEDGER_COLS = [f.name for f in schemas.LEDGER if f.name != "rank"]


def _wave_dir(out_dir: str, kind: str, w: int) -> str:
    return os.path.join(out_dir, kind, f"wave={w:04d}")


def _ckpt_dir(out_dir: str, w: int) -> str:
    return os.path.join(out_dir, "ckpt", f"enter_wave={w:04d}")


@ray.remote
def _count_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote(num_cpus=1)
def _gather_seq_rank(rank_base: int, *blocks):
    """(admitted seq sorted, aligned ranks) from the blocks of the
    globally-sorted admitted dataset — the zipWithIndex the Dataset API
    can't express, reduced to seq/rank int64 arrays (16 B per admitted
    row, bounded per wave by budget x hosts) living in the object
    store; rows never touch the driver (SURVEY.md §3.1)."""
    if not blocks:
        return np.array([], np.int64), np.array([], np.int64)
    seqs = np.concatenate([b["seq"].to_numpy() for b in blocks])
    ranks = np.arange(rank_base, rank_base + len(seqs), dtype=np.int64)
    by = np.argsort(seqs)
    return seqs[by], ranks[by]


def _rel_frontier(enter_wave: int) -> str:
    return os.path.join("ckpt", f"enter_wave={enter_wave:04d}", "frontier")


def _rel_admitted(enter_wave: int) -> str:
    return os.path.join("ckpt", f"enter_wave={enter_wave:04d}", "admitted.parquet")


class _FrontierState:
    """The incremental pending set: segment datasets + their checkpoint
    paths, admitted-seq filter refs + their delta paths, pending count,
    and the raw view size (pending + dead rows — drives adaptive
    compaction)."""

    def __init__(self, segments, seg_rel, aseq_refs, adm_rel, pending, n_view=None, chain_start=0):
        self.segments = segments
        self.seg_rel = seg_rel
        self.aseq_refs = aseq_refs
        self.adm_rel = adm_rel
        self.pending = pending
        self.n_view = pending if n_view is None else n_view
        # first enter_wave whose shard checkpoint the restore replay
        # chain starts from (reset by full snapshots on compaction)
        self.chain_start = chain_start

    def union(self):
        if len(self.segments) == 1:
            return self.segments[0]
        return self.segments[0].union(*self.segments[1:])


def _drop_admitted_rows(t: pa.Table, aseq_refs) -> pa.Table:
    """Filter out rows whose seq is in ANY of the admitted-seq arrays
    (each ref is a sorted int64 array in the object store; seq values
    are globally unique, so membership is one searchsorted per ref)."""
    if not aseq_refs or t.num_rows == 0:
        return t
    s = t["seq"].to_numpy()
    keep = np.ones(len(s), bool)
    for r in aseq_refs:
        a = ray.get(r)
        if len(a):
            idx = np.clip(np.searchsorted(a, s), 0, len(a) - 1)
            keep &= a[idx] != s
    return t.filter(pa.array(keep))


@ray.remote
def _extract_aseq(sel):
    """(aseq, arank) tuple -> just the sorted admitted-seq array (kept
    in the object store — the driver holds only the ref)."""
    return sel[0]


@ray.remote
def _write_admitted(sel, path: str) -> int:
    """Spill this wave's admitted seqs (the filter delta a resume
    replays) as parquet. Atomic via tmp+rename."""
    aseq = sel[0]
    t = pa.table({"seq": pa.array(aseq, pa.int64())})
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return len(aseq)


def _admit_table(table: pa.Table, cfg: CrawlConfig, shards, metrics) -> pa.Table:
    """Driver-side admission for small tables (seeds): scope+robots ->
    within-set dedup -> seen-set admit. Same stages as the wave path."""
    filt = st.RobotsScopeFilter(cfg, metrics)
    t = filt(table)
    t = st.combine_first_by_seq(t)
    client = st.DedupClient(shards, cfg.num_shards, "url")
    return client(t)


def run_crawl(
    seeds: list[str],
    cfg: CrawlConfig,
    out_dir: str,
    *,
    resume: bool = False,
) -> dict:
    """Run (or resume) the flagship crawl. Returns summary dict with
    paths and final metrics. Ray must already be initialised."""
    # seq-uniqueness invariant: seed seqs are 0..n-1, ref seqs are
    # >= link_bound — more seeds than link_bound would collide silently
    if len(seeds) > cfg.link_bound:
        raise ValueError(
            f"{len(seeds)} seeds > link_bound={cfg.link_bound}: seed seqs would "
            "collide with ref seqs; raise cfg.link_bound"
        )
    shards = make_shards(cfg.num_shards)
    metrics = MetricsActor.remote()
    if cfg.politeness_delay_s > 0:
        # fresh pacing windows per crawl: the limiter actor is cached
        # per (delay, job) and would otherwise carry the previous
        # crawl's next_free reservations into this one
        ray.get(_get_limiter(cfg).reset.remote())

    if resume:
        wave, rank_base, fstate = _restore(out_dir, shards, metrics)
    else:
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        frontier0 = _admit_table(st.seeds_to_frontier(seeds, cfg), cfg, shards, metrics)
        seg0_rel = _rel_frontier(0)
        _write_ckpt(
            out_dir, 0, frontier0, shards, metrics, rank_base=0,
            segments_rel=[seg0_rel] if frontier0.num_rows else [], admitted_rel=[],
        )()  # seal now
        # split the seed table across blocks — a single-block segment
        # would serialize wave 0's whole fetch pipeline into one task
        nblocks0 = max(cfg.num_partitions, 2 * int(ray.cluster_resources().get("CPU", 8)))
        seg0 = (
            ray.data.from_arrow(frontier0).repartition(nblocks0).materialize()
            if frontier0.num_rows
            else None
        )
        fstate = _FrontierState(
            segments=[seg0] if seg0 is not None else [],
            seg_rel=[seg0_rel] if seg0 is not None else [],
            aseq_refs=[], adm_rel=[], pending=frontier0.num_rows,
        )
        wave, rank_base = 0, 0

    # seals are ordered: manifest for enter_wave=w+1 is written only
    # after wave w's (possibly still-running) image sink finishes, so a
    # crash mid-overlap resumes at the unsealed wave and rewrites its
    # outputs — while wave w+1's COMPUTE overlaps wave w's sink.
    # INCREMENTAL FRONTIER: the pending set is a list of materialized
    # SEGMENT datasets (seeds + one new-links segment per wave) minus a
    # chain of admitted-seq filters (object-store refs, applied lazily
    # inside the selection scan). Per-wave checkpoint IO is the new
    # segment + a tiny admitted delta — not the whole frontier; every
    # cfg.compact_every-th wave physically compacts.
    prev_seal = None
    while True:
        if fstate.pending == 0 or wave >= cfg.max_depth or rank_base >= cfg.max_urls:
            break
        # interrupted-wave outputs are rewritten idempotently
        for kind in ("waves", "ledger"):
            d = _wave_dir(out_dir, kind, wave)
            if os.path.exists(d):
                shutil.rmtree(d)
        rank_base, seal, fstate = _run_wave(
            out_dir, wave, rank_base, cfg, shards, metrics, fstate
        )
        if prev_seal is not None:
            prev_seal()
        prev_seal = seal
        wave += 1
    # finalize: T5 seen dump — each shard spills its OWN sorted run in
    # parallel; the keys never pass through the driver (the audit-time
    # global sha1 sort lives in state.seen.load_seen, over result-sized
    # data only). Shard layout: out/seen/shard-K.parquet. All admits
    # completed with the last wave's compute, so the dumps START before
    # the final seal (which only joins the last image/ledger sinks) and
    # the two overlap.
    t5dir = os.path.join(out_dir, "seen")
    os.makedirs(t5dir, exist_ok=True)
    dump_futs = [
        s.dump_parquet.remote("url", os.path.join(t5dir, f"shard-{k}.parquet"))
        for k, s in enumerate(shards)
    ]
    if prev_seal is not None:
        prev_seal()
    ray.get(dump_futs)

    snap = ray.get(metrics.snapshot.remote())
    snap.update(ranks=rank_base, waves=wave)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(snap, f, indent=1)
    for s in shards:
        ray.kill(s)
    ray.kill(metrics)
    return {"out_dir": out_dir, "metrics": snap}


_TRACE = bool(os.environ.get("LULU_TRACE"))


@ray.remote(num_cpus=1)  # 1 CPU: must be schedulable even on tiny clusters (shards reserve 0.25 each)
def _finalize_selection(budget: int, max_take: int, rank_base: int, *blocks):
    """Exact per-host top-B + §3.2.4 total order + rank assignment over
    the politeness-bounded candidate columns. Returns (n_admitted,
    (adm_seq_sorted, ranks_aligned)) — the second value stays in the
    object store and is broadcast to the attach/drop filters."""
    if not blocks:
        return 0, (np.array([], np.int64), np.array([], np.int64))
    cand = pa.concat_tables(blocks).combine_chunks()
    idx = pc.sort_indices(
        cand,
        sort_keys=[
            ("host_hash", "ascending"), ("host", "ascending"),
            ("priority", "ascending"), ("seq", "ascending"),
        ],
    )
    srt = cand.take(idx)
    host_a = srt["host"].combine_chunks()
    n = len(host_a)
    neq = pc.not_equal(host_a.slice(1), host_a.slice(0, n - 1)).to_numpy(
        zero_copy_only=False
    )
    starts = np.r_[True, neq]
    gid = np.cumsum(starts) - 1
    pos = np.arange(n) - np.flatnonzero(starts)[gid]
    keep = np.flatnonzero(pos < budget)[:max_take]
    adm_seq = srt["seq"].to_numpy()[keep]  # in global rank order
    ranks = np.arange(rank_base, rank_base + len(adm_seq), dtype=np.int64)
    by_seq = np.argsort(adm_seq)
    return len(adm_seq), (adm_seq[by_seq], ranks[by_seq])


def _select_and_rank(frontier, cfg, rank_base, wave, aseq_refs=()):
    """Politeness selection + deterministic global rank assignment over
    the INCREMENTAL frontier view: previously-admitted rows are dropped
    inside the candidate scan (``aseq_refs`` filter chain — no physical
    deferred rebuild).

    Returns (ranked_factory, n_admitted, sel_ref): ranked_factory()
    yields a Dataset of admitted T1 rows + rank + fetch-wave stamp;
    sel_ref is the object-store (adm_seq_sorted, ranks) pair (its seq
    array becomes the next wave's filter delta). The admitted set per
    host is the first ``budget`` rows by (priority, seq); global order
    is (host_hash, host, priority, seq) truncated to max_urls -
    rank_base."""
    budget = cfg.budget
    refs = list(aseq_refs)
    cand_cols = (
        frontier.map_batches(
            lambda t: st.topb_per_host(_drop_admitted_rows(t, refs), budget),
            batch_format="pyarrow",
        )
        .select_columns(["host_hash", "host", "priority", "seq"])
        .materialize()
    )
    blocks = cand_cols.to_arrow_refs()
    counts = ray.get([_count_rows.remote(r) for r in blocks])
    blocks = [r for r, c in zip(blocks, counts) if c > 0]  # empty blocks lose schema
    n_cand = sum(counts)
    if n_cand > cfg.driver_select_max:
        return _select_distributed(frontier, cfg, rank_base, wave, cand_cols)

    # finalize in ONE remote task (pyarrow C++ multi-threaded sort over
    # the pruned candidate columns — rows never touch the driver; the
    # broadcast stays in the object store end-to-end)
    n_ref, ref = _finalize_selection.options(num_returns=2).remote(
        budget, cfg.max_urls - rank_base, rank_base, *blocks
    )
    n_admitted = ray.get(n_ref)
    return _ranked_factory(frontier, ref, wave), n_admitted, ref


def _ranked_factory(frontier, ref, wave):
    """Admitted-rows factory from a broadcast (adm_seq_sorted,
    ranks_aligned) ref — shared by both selection paths. seq values are
    globally unique, so membership + rank attach are one vectorized
    searchsorted per batch; rows admitted in EARLIER waves are not in
    aseq, so the attach filter drops them too (no pre-filter needed)."""

    def attach_rank(t: pa.Table) -> pa.Table:
        aseq, arank = ray.get(ref)
        s = t["seq"].to_numpy()
        if len(aseq) == 0:
            return t.slice(0, 0).append_column("rank", pa.array([], pa.int64()))
        idx = np.clip(np.searchsorted(aseq, s), 0, len(aseq) - 1)
        mask = aseq[idx] == s
        t = t.filter(pa.array(mask))
        rk = arank[np.searchsorted(aseq, t["seq"].to_numpy())]
        t = t.set_column(
            t.schema.get_field_index("wave"), "wave",
            pa.array(np.full(t.num_rows, wave, np.int32)),
        )
        return t.append_column("rank", pa.array(rk, pa.int64()))

    return lambda: frontier.map_batches(attach_rank, batch_format="pyarrow")


def _hot_hosts(cand_cols, threshold: int) -> list[str]:
    """Per-host candidate counts (per-batch pyarrow group_by partials ->
    tiny grouped Sum) -> hosts above ``threshold`` — the G1-driven hot
    set of SURVEY.md §4.3.2. The driver holds only the hot NAMES
    (≤ n_candidates/threshold entries), never the counts table."""
    if threshold <= 0:
        return []
    from ray.data.aggregate import Sum

    def cnt(t: pa.Table) -> pa.Table:
        out = pa.table({"host": t["host"]}).group_by(["host"]).aggregate([("host", "count")])
        # rename BY NAME: pyarrow group_by output column order (keys
        # first vs aggregates first) is version-dependent; a positional
        # rename could silently swap host/count
        return out.select(["host", "host_count"]).rename_columns(["host", "n"])

    agg = cand_cols.map_batches(cnt, batch_format="pyarrow").groupby("host").aggregate(
        Sum("n", alias_name="n")
    )
    hot: list[str] = []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        for i in np.flatnonzero(b["n"].to_numpy() > threshold):
            hot.append(b["host"][int(i)].as_py())
    return sorted(hot)


def _salt_candidates(t: pa.Table, hot_arr, n_salts: int) -> pa.Table:
    """Attach the hot-domain split key: salt = hash(seq) % n_salts for
    rows of a hot host — a Fibonacci multiplicative hash, not seq %
    n_salts, because real seqs are structured ((rank+1)*link_bound + j)
    and a plain modulus aliases onto few groups. Cold hosts keep salt 0
    (single group, no extra pass). Pure function of (hot set, seq) —
    order-neutral (§3.2.4)."""
    if hot_arr is None or len(hot_arr) == 0:
        salt = np.zeros(t.num_rows, np.int32)
    else:
        hosts = np.asarray(t["host"].to_pylist(), dtype=object)
        ishot = np.isin(hosts, hot_arr)
        h = (t["seq"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)
        salt = np.where(ishot, h % np.uint64(n_salts), 0).astype(np.int32)
    return t.append_column("salt", pa.array(salt))


def _select_distributed(frontier, cfg, rank_base, wave, cand_cols):
    """Fallback for waves whose candidate set exceeds the driver budget,
    with explicit HOT-DOMAIN SPLITTING (BASELINE.json:6 "explicit skew
    mitigation (hot-domain splitting, salted shuffle)"; SURVEY.md
    §4.3.2): hosts whose candidate count exceeds cfg.hot_host_threshold
    get their per-host top-B split (salt = fib_hash(seq) % n_salts —
    _salt_candidates uses a Fibonacci multiplicative hash because a
    plain seq % n_salts aliases on structured seq patterns)
    across n_salts groups, each reduced in its own task, then finalized
    per host over ≤ B×n_salts rows — exact because top-B of per-salt
    top-Bs == top-B, and order-preserving because the split is a pure
    function of (count, seq), never of placement (§3.2.4). Cold hosts
    skip the split (salt=0, single group). Global order via a
    range-partitioned sort over the PRUNED candidate columns; ranks
    and the deferred filter via the shared seq broadcast."""
    budget = cfg.budget
    n_salts = cfg.num_partitions
    hot = _hot_hosts(cand_cols, cfg.hot_host_threshold)
    hot_ref = ray.put(np.array(hot, dtype=object)) if hot else None

    def add_salt(t: pa.Table) -> pa.Table:
        return _salt_candidates(
            t, None if hot_ref is None else ray.get(hot_ref), n_salts
        )

    pre = (
        cand_cols.map_batches(add_salt, batch_format="pyarrow")
        .repartition(cfg.num_partitions)
        .groupby(["host", "salt"])
        .map_groups(lambda g: st.topb_per_host(g, budget), batch_format="pyarrow")
    )
    admitted_ds = (
        pre.drop_columns(["salt"])
        .groupby("host")
        .map_groups(lambda g: st.topb_per_host(g, budget), batch_format="pyarrow")
    )
    admitted_ds = admitted_ds.sort(["host_hash", "host", "priority", "seq"]).limit(
        cfg.max_urls - rank_base
    )
    refs = admitted_ds.to_arrow_refs()
    counts = ray.get([_count_rows.remote(r) for r in refs])
    refs = [r for r, c in zip(refs, counts) if c > 0]  # empty sort blocks lose schema
    n_admitted = int(sum(counts))
    ref = _gather_seq_rank.remote(rank_base, *refs)
    return _ranked_factory(frontier, ref, wave), n_admitted, ref


_LIMITERS: dict[tuple, object] = {}


def _get_limiter(cfg: CrawlConfig):
    """One HostRateLimiter actor per (session, delay) — shared by every
    wave of a crawl so per-host windows never overlap across waves. The
    key includes the Ray job id: a handle cached across
    ray.shutdown()/ray.init() would point at a dead actor."""
    key = (cfg.politeness_delay_s, ray.get_runtime_context().get_job_id())
    lim = _LIMITERS.get(key)
    if lim is None:
        from .steps import make_rate_limiter

        lim = _LIMITERS[key] = make_rate_limiter(cfg.politeness_delay_s)
    return lim


def _run_wave(out_dir, wave, rank_base, cfg, shards, metrics, fstate):
    marks = [time.time()]

    def _mark(label):
        if _TRACE:
            marks.append(time.time())
            print(f"[wave {wave}] {label}: {marks[-1]-marks[-2]:.2f}s", flush=True)

    # block count == per-stage task parallelism: pin it to the session's
    # CPU count so every stage can fill the machine regardless of how
    # many files the previous wave happened to write
    nblocks = max(cfg.num_partitions, 2 * int(ray.cluster_resources().get("CPU", 8)))
    frontier = fstate.union()

    # ── politeness selection (A2): per-batch top-B combiner first — the
    # bulk of a skewed host's pending URLs never leaves its block
    # (SURVEY.md §4.3); the incremental frontier's admitted filter is
    # folded into the same scan. The candidate set is
    # politeness-bounded (≤ B×hosts×blocks), so for typical waves the
    # finalize (exact per-host top-B + global order + rank) runs in ONE
    # remote task over FOUR pruned numpy columns; waves whose candidate
    # set exceeds cfg.driver_select_max fall back to the distributed
    # groupby+sort+zipWithIndex path. Both paths compute the identical
    # admitted set and ranks (SURVEY.md §3.2.4).
    ranked, n_admitted, sel_ref = _select_and_rank(
        frontier, cfg, rank_base, wave, fstate.aseq_refs
    )
    _mark("select+sort+rank")
    if n_admitted == 0:
        # politeness cannot defer forever (every host admits ≥min(B,pending))
        # so an empty admission means an empty frontier — seal and stop.
        seal = _write_ckpt(
            out_dir, wave + 1, None, shards, metrics, rank_base=rank_base,
            segments_rel=[], admitted_rel=[], chain_start=fstate.chain_start,
        )
        fstate.pending = 0
        return rank_base, seal, fstate

    # T4 ledger for this wave (rank-contiguous, one dir per wave) —
    # written from a driver thread so it overlaps the fetch pipeline
    ledger_t = _bg(
        lambda: ranked()
        .select_columns(["rank"] + _LEDGER_COLS)
        .write_parquet(_wave_dir(out_dir, "ledger", wave))
    )
    _mark("ledger")

    # ── fetch -> parse -> scope/robots (streamed; bodies never outlive
    # the parse stage; out-of-scope/robots-blocked rows die before the
    # materialize so they never cost object-store space)
    fetcher = st.PageFetcher(cfg)
    if cfg.politeness_delay_s > 0:
        # pacing wraps the fetcher; order stays untouched (selection
        # and rank assignment precede the fetch stage)
        from .steps import PacedFetcher

        fetcher = PacedFetcher(fetcher, _get_limiter(cfg), cfg.politeness_delay_s)
    parser = st.PageParser(cfg)
    scope_filter = st.RobotsScopeFilter(cfg, metrics, wave=wave)
    refs = (
        ranked()
        .map_batches(fetcher, batch_size=cfg.fetch_batch_size, batch_format="pyarrow")
        .map_batches(parser, batch_size=cfg.fetch_batch_size, batch_format="pyarrow")
        .map_batches(scope_filter, batch_format="pyarrow")
        .materialize()  # consumed twice (links + images)
    )
    _mark("fetch+parse")

    # ── within-wave dedup (D1+D2 in ONE grouped aggregate): first-by-seq
    # per (kind, url_sha1) — seq is globally unique across kinds, so one
    # broadcast min-seq set serves both branches
    deduped = st.dedup_first_by_seq(refs, ["kind", "url_sha1"], driver_max=cfg.driver_dedup_max)
    _mark("wave_dedup")

    # ── image branch: global image-seen admit MATERIALIZES first (the
    # admitted refs are small, and the seen-set mutation must complete
    # before this wave's shard-delta checkpoint); the heavy sink
    # (payload fetch/decode/phash + parquet write) then runs from a
    # driver thread and is allowed to overlap the NEXT wave's compute —
    # its join gates only the wave's manifest seal.
    images = deduped.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    admitted_imgs = images.map_batches(
        st.DedupClient(shards, cfg.num_shards, "img"),
        batch_size=cfg.dedup_batch_size,
        batch_format="pyarrow",
    ).materialize()
    t3 = admitted_imgs.map_batches(
        st.ImageFetcher(cfg, metrics, wave=wave),
        batch_size=cfg.image_batch_size,
        batch_format="pyarrow",
    )
    images_t = _bg(lambda: write_images(t3, _wave_dir(out_dir, "waves", wave)))
    _mark("images")

    # ── link branch: seen-set admit -> next frontier
    links = deduped.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "link")), batch_format="pyarrow"
    )
    links = links.map_batches(
        st.DedupClient(shards, cfg.num_shards, "url"),
        batch_size=cfg.dedup_batch_size,
        batch_format="pyarrow",
    )
    new_frontier_lazy = links.map_batches(st.refs_to_frontier, batch_format="pyarrow")
    _mark("links_built")

    # ── INCREMENTAL F_{w+1}: append the new-links SEGMENT + this wave's
    # admitted-seq filter delta (an object-store ref — the driver never
    # holds the arrays). Checkpoint IO per wave = the new segment + a
    # tiny admitted parquet, both written in the background and gating
    # only the manifest seal. Every cfg.compact_every-th wave instead
    # COMPACTS: physically materializes the filtered union into one
    # segment and resets the filter chain (bounding both the segment
    # list and the filter-chain length — at 10^10 the chain would
    # otherwise grow toward the whole seen set).
    aseq_ref = _extract_aseq.remote(sel_ref)
    this_rel = _rel_frontier(wave + 1)
    adm_rel = _rel_admitted(wave + 1)
    # adaptive compaction decided from PRE-wave state (deciding on the
    # new-links count would force materializing them separately — an
    # extra execution barrier per wave): dead share = already-filtered
    # rows plus this wave's admissions over the current view
    n_dead = (fstate.n_view - fstate.pending) + n_admitted
    compact = (cfg.compact_every > 0 and (wave + 1) % cfg.compact_every == 0) or (
        fstate.n_view > 0 and n_dead / fstate.n_view > cfg.compact_dead_frac
    )
    if compact:
        # ONE materialize: filtered old view ∪ lazy new links (this also
        # forces the link seen-set admits before the shard checkpoint)
        refs_all = list(fstate.aseq_refs) + [aseq_ref]
        nxt = (
            fstate.union()
            .map_batches(lambda t: _drop_admitted_rows(t, refs_all), batch_format="pyarrow")
            .union(new_frontier_lazy)
            .repartition(nblocks)
            .materialize()
        )
        pending2 = nxt.count()
        new_state = _FrontierState(
            [nxt], [this_rel], [], [], pending2, n_view=pending2,
            chain_start=wave + 1,  # full shard snapshot resets the replay chain
        )
        ckpt_ds = nxt
        admitted_src = None  # filter chain resets; nothing to replay
        adm_rel_list: list = []
    else:
        new_frontier = new_frontier_lazy.repartition(nblocks).materialize()
        n_new = new_frontier.count()
        admitted_src = (sel_ref, adm_rel)  # _write_ckpt fires it AFTER the dir exists
        pending2 = fstate.pending - n_admitted + n_new
        new_state = _FrontierState(
            fstate.segments + [new_frontier],
            fstate.seg_rel + [this_rel],
            fstate.aseq_refs + [aseq_ref],
            fstate.adm_rel + [adm_rel],
            pending2,
            n_view=fstate.n_view + n_new,
            chain_start=fstate.chain_start,
        )
        ckpt_ds = new_frontier
        adm_rel_list = new_state.adm_rel
    seal = _write_ckpt(
        out_dir, wave + 1, ckpt_ds, shards, metrics,
        rank_base=rank_base + n_admitted, n_frontier=pending2,
        segments_rel=new_state.seg_rel, admitted_rel=adm_rel_list,
        admitted_src=admitted_src, shards_full=compact,
        chain_start=new_state.chain_start,
        pre_seal=lambda: (images_t(), ledger_t()),
    )
    _mark("frontier_ckpt")
    return rank_base + n_admitted, seal, new_state


def _bg(fn):
    """Run fn on a driver thread (concurrent Dataset execution); the
    returned joiner re-raises any exception at join time."""
    import threading

    box: dict = {}

    def run():
        try:
            fn()
        except BaseException as e:  # noqa: BLE001 — propagate at join
            box["err"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()

    def join():
        t.join()
        if "err" in box:
            raise box["err"]

    return join


def _write_ckpt(
    out_dir, enter_wave, frontier, shards, metrics, *, rank_base, n_frontier=None,
    segments_rel=None, admitted_rel=None, admitted_src=None, shards_full=False,
    chain_start=0, pre_seal=None,
):
    """Write checkpoint DATA (shard deltas now; segment parquet +
    admitted delta in the background when given a materialized Dataset)
    and return the seal closure (join background sinks, then write
    manifest). The manifest's segments/admitted_files lists are what a
    resume reconstructs the incremental pending view from."""
    _t0 = time.time()
    cdir = _ckpt_dir(out_dir, enter_wave)
    if os.path.exists(cdir):
        shutil.rmtree(cdir)
    fdir = os.path.join(cdir, "frontier")
    os.makedirs(fdir, exist_ok=True)
    frontier_t = None
    if frontier is not None:
        if isinstance(frontier, pa.Table):
            pq.write_table(
                schemas.check(frontier, schemas.FRONTIER, "ckpt"), os.path.join(fdir, "f.parquet")
            )
            n_frontier = frontier.num_rows
        else:
            # frontier is MATERIALIZED (the admits already ran); the
            # parquet spill is pure encode+IO, so it runs from a driver
            # thread and gates only the manifest seal — the next wave
            # consumes the in-memory blocks, not this file
            assert n_frontier is not None, "Dataset frontier needs n_frontier"
            frontier_t = _bg(lambda: frontier.write_parquet(fdir))
    else:
        n_frontier = 0
    admitted_fut = None
    if admitted_src is not None:
        sel_ref, adm_rel = admitted_src
        admitted_fut = _write_admitted.remote(sel_ref, os.path.join(out_dir, adm_rel))
    if _TRACE:
        print(f"  [ckpt {enter_wave}] frontier write scheduled ({n_frontier} rows): {time.time()-_t0:.2f}s", flush=True)
    _t1 = time.time()
    # shard deltas: every seen-set admit of the finished wave is done by
    # now (link admits run inside the pre-ckpt frontier materialize,
    # image admits in their own materialize); the still-running image
    # SINK does no admits, so it only gates the manifest, not the data.
    sdir = os.path.join(cdir, "shards")
    os.makedirs(sdir, exist_ok=True)
    ray.get(
        [
            s.checkpoint.remote(os.path.join(sdir, f"shard-{k}.bin"), shards_full)
            for k, s in enumerate(shards)
        ]
    )
    if _TRACE:
        print(f"  [ckpt {enter_wave}] shard dumps: {time.time()-_t1:.2f}s", flush=True)
    def seal():
        _ts = time.time()
        if frontier_t is not None:
            frontier_t()  # frontier parquet must be on disk before the manifest
        if admitted_fut is not None:
            ray.get(admitted_fut)  # ditto the admitted-seq delta
        if pre_seal is not None:
            pre_seal()  # join the wave's background sinks
        # metrics snapshot AFTER the sinks join — increments emitted by a
        # still-running image sink (e.g. image_dropped) land in the
        # manifest a resumed run restores from
        manifest = {
            "enter_wave": enter_wave,
            "rank_base": rank_base,
            "n_frontier": n_frontier,
            # incremental frontier: the segment + admitted-delta files a
            # resume reconstructs the pending view from
            "segments": list(segments_rel or []),
            "admitted_files": list(admitted_rel or []),
            "shard_chain_start": chain_start,
            # increments are wave-tagged: < enter_wave covers every
            # finished wave (incl. its just-joined background sink) and
            # excludes the already-overlapping next wave's compute
            "metrics": ray.get(metrics.snapshot.remote(enter_wave)),
        }
        tmp = os.path.join(cdir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(cdir, "manifest.json"))
        if _TRACE:
            print(f"  [ckpt {enter_wave}] seal (join+manifest): {time.time()-_ts:.2f}s", flush=True)

    return seal


def _restore(out_dir, shards, metrics):
    """Find the last sealed checkpoint, restore shard + metric state +
    the incremental frontier view (segments + admitted filter chain),
    drop any unsealed later checkpoints."""
    ckroot = os.path.join(out_dir, "ckpt")
    sealed = []
    for d in sorted(os.listdir(ckroot)):
        mf = os.path.join(ckroot, d, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                sealed.append(json.load(f))
        else:
            shutil.rmtree(os.path.join(ckroot, d))  # unsealed → delete
    if not sealed:
        raise FileNotFoundError(f"no sealed checkpoint under {ckroot}")
    m = sealed[-1]
    w = m["enter_wave"]
    # incremental shard checkpoints: replay the delta chain from the
    # last FULL snapshot (shard_chain_start) — restore cost is bounded
    # by the compaction cadence, not crawl length
    start = m.get("shard_chain_start", 0)
    waves = [mm["enter_wave"] for mm in sealed if mm["enter_wave"] >= start]
    ray.get(
        [
            s.restore.remote(
                [os.path.join(_ckpt_dir(out_dir, ww), "shards", f"shard-{k}.bin") for ww in waves]
            )
            for k, s in enumerate(shards)
        ]
    )
    ray.get(metrics.reset.remote(m["metrics"]))

    nblocks = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
    segments = [
        ray.data.read_parquet(
            os.path.join(out_dir, rel), partitioning=None,
            override_num_blocks=max(2, nblocks // max(len(m["segments"]), 1)),
        ).materialize()
        for rel in m["segments"]
    ]
    aseq_refs = []
    for rel in m.get("admitted_files", []):
        arr = pq.read_table(os.path.join(out_dir, rel))["seq"].to_numpy()
        aseq_refs.append(ray.put(np.sort(arr)))
    n_view = sum(seg.count() for seg in segments)
    fstate = _FrontierState(
        segments, list(m["segments"]), aseq_refs, list(m.get("admitted_files", [])),
        m["n_frontier"], n_view=n_view, chain_start=m.get("shard_chain_start", 0),
    )
    return w, m["rank_base"], fstate
