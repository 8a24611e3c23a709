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

    out/ckpt/enter_wave=NNNN/frontier/*.parquet   F_W at entry of wave W
    out/ckpt/enter_wave=NNNN/shards/shard-K.bin   seen-set shard dumps
    out/ckpt/enter_wave=NNNN/manifest.json        written LAST = seal
    out/ledger/wave=NNNN/*.parquet                T4 crawl order
    out/waves/wave=NNNN/...                       T3 image rows (Lance/Parquet)

Resume = restore shards + frontier from the last sealed enter_wave
manifest and re-run from that wave; output dirs of the interrupted wave
are deleted first, and rank assignment recomputes identically
(SURVEY.md §3.3 wave-granular idempotence).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
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


@ray.remote
def _add_rank(t: pa.Table, base: int, wave: int) -> pa.Table:
    """Adds the contiguous rank and stamps the FETCH wave (a deferred
    row's `wave` column still holds its admission wave)."""
    t = t.set_column(
        t.schema.get_field_index("wave"), "wave", pa.array([wave] * t.num_rows, pa.int32())
    )
    return t.append_column("rank", pa.array(np.arange(base, base + t.num_rows), pa.int64()))


def _assign_ranks(admitted: ray.data.Dataset, base: int, wave: int) -> tuple[list, int]:
    """Global contiguous rank over a sorted Dataset — the one operation
    the Dataset API can't express (zipWithIndex): block refs in sorted
    order + per-block offsets computed from row counts; rows never touch
    the driver (SURVEY.md §3.1)."""
    refs = admitted.to_arrow_refs()
    counts = ray.get([_count_rows.remote(r) for r in refs])
    refs = [r for r, c in zip(refs, counts) if c > 0]  # empty sort blocks have no schema
    counts = [c for c in counts if c > 0]
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1] if counts else []]) + base
    ranked = [_add_rank.remote(r, int(off), wave) for r, off in zip(refs, offsets)]
    return ranked, int(sum(counts))


def _frontier_count(path: str) -> int:
    try:
        return pads.dataset(path, format="parquet").count_rows()
    except FileNotFoundError:
        return 0


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
    shards = make_shards(cfg.num_shards)
    metrics = MetricsActor.remote()

    if resume:
        wave, rank_base = _restore(out_dir, shards, metrics)
    else:
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        frontier0 = _admit_table(st.seeds_to_frontier(seeds, cfg), cfg, shards, metrics)
        _write_ckpt(out_dir, 0, frontier0, shards, metrics, rank_base=0)
        wave, rank_base = 0, 0

    while True:
        fdir = os.path.join(_ckpt_dir(out_dir, wave), "frontier")
        n_frontier = _frontier_count(fdir)
        if n_frontier == 0 or wave >= cfg.max_depth or rank_base >= cfg.max_urls:
            break
        # interrupted-wave outputs are rewritten idempotently
        for kind in ("waves", "ledger"):
            d = _wave_dir(out_dir, kind, wave)
            if os.path.exists(d):
                shutil.rmtree(d)
        rank_base = _run_wave(out_dir, wave, rank_base, cfg, shards, metrics)
        wave += 1

    # finalize: T5 seen dump (sorted url_sha1 across shards — shard ranges
    # are ordered by host_hash, but T5 is sorted by sha1, so merge-sort)
    seen = sorted(
        k for ks in ray.get([s.dump_keys.remote("url") for s in shards]) for k in ks
    )
    t5 = pa.table({"url_sha1": pa.array(seen, pa.binary(20))}, schema=schemas.SEEN_DUMP)
    pq.write_table(t5, os.path.join(out_dir, "seen.parquet"))

    snap = ray.get(metrics.snapshot.remote())
    snap.update(ranks=rank_base, waves=wave)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(snap, f, indent=1)
    for s in shards:
        ray.kill(s)
    ray.kill(metrics)
    return {"out_dir": out_dir, "metrics": snap}


def _run_wave(out_dir, wave, rank_base, cfg, shards, metrics) -> int:
    fdir = os.path.join(_ckpt_dir(out_dir, wave), "frontier")
    frontier = ray.data.read_parquet(fdir, partitioning=None)

    # ── politeness selection (A2): per-batch top-B combiner, then exact
    # per-host top-B — only candidate rows (≤ B×hosts×blocks) shuffle;
    # the bulk of a skewed host's pending URLs never leave their block
    # (SURVEY.md §4.3 hot-domain handling).
    budget = cfg.budget
    cand = frontier.map_batches(
        lambda t: st.topb_per_host(t, budget), batch_format="pyarrow"
    )
    admitted_ds = cand.groupby("host").map_groups(
        lambda g: st.topb_per_host(g, budget), batch_format="pyarrow"
    )
    admitted_ds = admitted_ds.sort(["host_hash", "host", "priority", "seq"]).limit(
        cfg.max_urls - rank_base
    )
    ranked_refs, n_admitted = _assign_ranks(admitted_ds, rank_base, wave)
    if n_admitted == 0:
        # politeness cannot defer forever (every host admits ≥min(B,pending))
        # so an empty admission means an empty frontier — seal and stop.
        _write_ckpt(out_dir, wave + 1, None, shards, metrics, rank_base=rank_base)
        return rank_base

    # T4 ledger for this wave (rank-contiguous, one dir per wave)
    ranked = lambda: ray.data.from_arrow_refs(list(ranked_refs))
    ranked().select_columns(["rank"] + _LEDGER_COLS).write_parquet(
        _wave_dir(out_dir, "ledger", wave)
    )

    # ── deferred = frontier minus admitted (broadcast anti-filter; the
    # admitted side is politeness-bounded — BASELINE.json:6's budget is
    # itself the bound that keeps this broadcast small)
    admitted_keys = ray.put(
        set(
            k
            for b in ranked().iter_batches(batch_format="pyarrow", batch_size=65536)
            for k in b["url_sha1"].to_pylist()
        )
    )

    def drop_admitted(t: pa.Table) -> pa.Table:
        keys = ray.get(admitted_keys)
        mask = [k not in keys for k in t["url_sha1"].to_pylist()]
        return t.filter(pa.array(mask))

    deferred = frontier.map_batches(drop_admitted, batch_format="pyarrow")

    # ── fetch -> parse (streamed; bodies never outlive the parse stage)
    fetcher = st.PageFetcher(cfg)
    parser = st.PageParser(cfg)
    refs = (
        ranked()
        .map_batches(fetcher, batch_size=cfg.fetch_batch_size, batch_format="pyarrow")
        .map_batches(parser, batch_size=cfg.fetch_batch_size, batch_format="pyarrow")
        .materialize()  # consumed twice (links + images); bodies already dropped
    )

    scope_filter = st.RobotsScopeFilter(cfg, metrics)

    # ── image branch: scope/robots -> wave-dedup (D2) -> global image-seen
    # -> fetch/decode/phash -> T3 wave dir
    images = refs.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    images = images.map_batches(scope_filter, batch_format="pyarrow")
    images = st.dedup_first_by_seq(images, "url_sha1")
    images = images.map_batches(
        st.DedupClient(shards, cfg.num_shards, "img"),
        batch_size=cfg.dedup_batch_size,
        batch_format="pyarrow",
    )
    t3 = images.map_batches(
        st.ImageFetcher(cfg, metrics),
        batch_size=cfg.image_batch_size,
        batch_format="pyarrow",
    )
    write_images(t3, _wave_dir(out_dir, "waves", wave))

    # ── link branch: scope/robots -> D1 wave-dedup -> seen-set admit
    links = refs.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "link")), batch_format="pyarrow"
    )
    links = links.map_batches(scope_filter, batch_format="pyarrow")
    links = st.dedup_first_by_seq(links, "url_sha1")
    links = links.map_batches(
        st.DedupClient(shards, cfg.num_shards, "url"),
        batch_size=cfg.dedup_batch_size,
        batch_format="pyarrow",
    )
    new_frontier = links.map_batches(st.refs_to_frontier, batch_format="pyarrow")

    # ── F_{w+1} = deferred ∪ new; checkpoint + seal
    nxt = deferred.union(new_frontier)
    _write_ckpt(out_dir, wave + 1, nxt, shards, metrics, rank_base=rank_base + n_admitted)
    return rank_base + n_admitted


def _write_ckpt(out_dir, enter_wave, frontier, shards, metrics, *, rank_base) -> None:
    cdir = _ckpt_dir(out_dir, enter_wave)
    if os.path.exists(cdir):
        shutil.rmtree(cdir)
    fdir = os.path.join(cdir, "frontier")
    os.makedirs(fdir, exist_ok=True)
    n_frontier = 0
    if frontier is not None:
        if isinstance(frontier, pa.Table):
            pq.write_table(
                schemas.check(frontier, schemas.FRONTIER, "ckpt"), os.path.join(fdir, "f.parquet")
            )
            n_frontier = frontier.num_rows
        else:
            frontier.write_parquet(fdir)
            n_frontier = _frontier_count(fdir)
    sdir = os.path.join(cdir, "shards")
    os.makedirs(sdir, exist_ok=True)
    ray.get(
        [
            s.checkpoint.remote(os.path.join(sdir, f"shard-{k}.bin"))
            for k, s in enumerate(shards)
        ]
    )
    snap = ray.get(metrics.snapshot.remote())
    manifest = {
        "enter_wave": enter_wave,
        "rank_base": rank_base,
        "n_frontier": n_frontier,
        "metrics": snap,
    }
    tmp = os.path.join(cdir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(cdir, "manifest.json"))  # seal


def _restore(out_dir, shards, metrics) -> tuple[int, int]:
    """Find the last sealed checkpoint, restore shard + metric state,
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
    sdir = os.path.join(_ckpt_dir(out_dir, w), "shards")
    ray.get(
        [
            s.restore.remote(os.path.join(sdir, f"shard-{k}.bin"))
            for k, s in enumerate(shards)
        ]
    )
    ray.get(metrics.reset.remote(m["metrics"]))
    return w, m["rank_base"]
