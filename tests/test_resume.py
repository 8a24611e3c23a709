"""Kill/resume test (SURVEY.md §5.2.4, BASELINE.json:6 "a killed job
resumes mid-crawl with identical downstream state"): complete a crawl,
then rewind the output to look like a job killed mid-crawl (later
checkpoints unsealed/missing, the in-flight wave's outputs partial),
resume, and require byte-identical T4/T5/T3 vs the straight run."""

import json
import os
import shutil

import pyarrow.dataset as pads
import pyarrow.compute as pc

from lulu_crawler_ray.config import CrawlConfig, seed_urls
from lulu_crawler_ray.pipelines.oracle import run_oracle
from lulu_crawler_ray.state.seen import load_seen

CFG = CrawlConfig(seed=11, budget=3, max_depth=4, max_urls=500, n_hosts=12, num_shards=4)
N_SEEDS = 8


def _collect(out):
    led = pads.dataset(f"{out}/ledger", format="parquet").to_table()
    led = led.take(pc.sort_indices(led, sort_keys=[("rank", "ascending")]))
    seen = load_seen(out)
    imgs = pads.dataset(f"{out}/waves", format="parquet").to_table()
    imgs = imgs.take(pc.sort_indices(imgs, sort_keys=[("image_id", "ascending")]))
    return led, seen, imgs


def test_kill_and_resume(tmp_path, ray_session):
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    straight = str(tmp_path / "straight")
    run_crawl(seed_urls(CFG, N_SEEDS), CFG, straight)
    s_led, s_seen, s_imgs = _collect(straight)
    waves_run = len(os.listdir(f"{straight}/ledger"))
    assert waves_run >= 3, "need enough waves to kill in the middle"

    # clone the straight run, then "kill" it after wave k=1 sealed:
    kill = str(tmp_path / "killed")
    shutil.copytree(straight, kill)
    shutil.rmtree(f"{kill}/seen")
    os.remove(f"{kill}/metrics.json")
    for d in sorted(os.listdir(f"{kill}/ckpt")):
        w = int(d.split("=")[1])
        if w == 2:  # unsealed in-flight checkpoint
            os.remove(f"{kill}/ckpt/{d}/manifest.json")
        elif w > 2:
            shutil.rmtree(f"{kill}/ckpt/{d}")
    # wave 2 was mid-flight: partial image output, no ledger yet
    shutil.rmtree(f"{kill}/ledger/wave=0002")
    for extra in sorted(os.listdir(f"{kill}/waves")):
        if int(extra.split("=")[1]) >= 2:
            shutil.rmtree(f"{kill}/waves/{extra}")

    run_crawl(seed_urls(CFG, N_SEEDS), CFG, kill, resume=True)
    k_led, k_seen, k_imgs = _collect(kill)

    assert k_led.equals(s_led)
    assert k_seen.equals(s_seen)
    assert k_imgs.equals(s_imgs)

    # and both equal the oracle
    oracle = run_oracle(seed_urls(CFG, N_SEEDS), CFG)
    assert k_led.num_rows == len(oracle.ledger)
    assert k_led["url"].to_pylist() == [r["url"] for r in oracle.ledger]
    assert k_seen["url_sha1"].to_pylist() == sorted(oracle.seen)

    with open(f"{kill}/metrics.json") as f:
        m = json.load(f)
    assert m["ranks"] == len(oracle.ledger)


def test_compaction_and_incremental_segments(tmp_path, ray_session):
    """compact_every=2 forces a mid-crawl compaction: output must equal
    the oracle and the default (compact_every=8, never compacts here)
    run; non-compaction checkpoints hold only the new-links DELTA
    segment plus an admitted-seq file."""
    import pyarrow.dataset as pads

    from lulu_crawler_ray.pipelines.crawl import run_crawl

    cfg_c = CrawlConfig(
        seed=11, budget=3, max_depth=4, max_urls=500, n_hosts=12, num_shards=4,
        compact_every=2,
    )
    out_c = str(tmp_path / "compact")
    run_crawl(seed_urls(cfg_c, N_SEEDS), cfg_c, out_c)
    c_led, c_seen, c_imgs = _collect(out_c)

    out_d = str(tmp_path / "default")
    run_crawl(seed_urls(CFG, N_SEEDS), CFG, out_d)
    d_led, d_seen, d_imgs = _collect(out_d)
    assert c_led.equals(d_led) and c_seen.equals(d_seen) and c_imgs.equals(d_imgs)

    oracle = run_oracle(seed_urls(CFG, N_SEEDS), CFG)
    assert c_led["url"].to_pylist() == [r["url"] for r in oracle.ledger]

    # layout: in forced DELTA mode (adaptive compaction off) a wave's
    # manifest lists multiple segments and admitted-delta files, and
    # output still equals the oracle
    import json as _json

    cfg_delta = CrawlConfig(
        seed=11, budget=3, max_depth=4, max_urls=500, n_hosts=12, num_shards=4,
        compact_every=0, compact_dead_frac=1.1,
    )
    out_i = str(tmp_path / "delta")
    run_crawl(seed_urls(cfg_delta, N_SEEDS), cfg_delta, out_i)
    i_led, i_seen, i_imgs = _collect(out_i)
    assert i_led.equals(d_led) and i_seen.equals(d_seen) and i_imgs.equals(d_imgs)
    manifests = []
    for d in sorted(os.listdir(f"{out_i}/ckpt")):
        with open(f"{out_i}/ckpt/{d}/manifest.json") as f:
            manifests.append(_json.load(f))
    multi = [m for m in manifests if len(m["segments"]) > 1]
    assert multi, "expected incremental (multi-segment) manifests"
    assert any(m["admitted_files"] for m in manifests)
    cm = []
    for d in sorted(os.listdir(f"{out_c}/ckpt")):
        with open(f"{out_c}/ckpt/{d}/manifest.json") as f:
            cm.append(_json.load(f))
    # the compact_every=2 run must contain a post-compaction manifest:
    # exactly one segment, empty filter chain, at a wave > 0
    assert any(
        len(m["segments"]) == 1 and not m["admitted_files"] and m["enter_wave"] > 0
        for m in cm
    )


def test_resume_across_compaction_boundary(tmp_path, ray_session):
    """Kill right after a compaction seal and resume — byte equality."""
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        seed=11, budget=3, max_depth=4, max_urls=500, n_hosts=12, num_shards=4,
        compact_every=2,
    )
    straight = str(tmp_path / "straight")
    run_crawl(seed_urls(cfg, N_SEEDS), cfg, straight)
    s_led, s_seen, s_imgs = _collect(straight)

    kill = str(tmp_path / "killed")
    shutil.copytree(straight, kill)
    shutil.rmtree(f"{kill}/seen")
    os.remove(f"{kill}/metrics.json")
    # keep dirs <= 2 sealed (enter_wave=2 is the compaction ckpt),
    # unseal 3, drop later — the resume replays from the compacted view
    for d in sorted(os.listdir(f"{kill}/ckpt")):
        w = int(d.split("=")[1])
        if w == 3:
            os.remove(f"{kill}/ckpt/{d}/manifest.json")
        elif w > 3:
            shutil.rmtree(f"{kill}/ckpt/{d}")
    for wdir in ("ledger", "waves"):
        for extra in sorted(os.listdir(f"{kill}/{wdir}")):
            if int(extra.split("=")[1]) >= 3:
                shutil.rmtree(f"{kill}/{wdir}/{extra}")

    run_crawl(seed_urls(cfg, N_SEEDS), cfg, kill, resume=True)
    k_led, k_seen, k_imgs = _collect(kill)
    assert k_led.equals(s_led)
    assert k_seen.equals(s_seen)
    assert k_imgs.equals(s_imgs)


def test_resume_in_delta_mode(tmp_path, ray_session):
    """Kill/resume with adaptive compaction OFF — the resume must
    reconstruct the pending view from multi-segment manifests plus the
    admitted-seq delta chain."""
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        seed=11, budget=3, max_depth=4, max_urls=500, n_hosts=12, num_shards=4,
        compact_every=0, compact_dead_frac=1.1,
    )
    straight = str(tmp_path / "straight")
    run_crawl(seed_urls(cfg, N_SEEDS), cfg, straight)
    s_led, s_seen, s_imgs = _collect(straight)

    kill = str(tmp_path / "killed")
    shutil.copytree(straight, kill)
    shutil.rmtree(f"{kill}/seen")
    os.remove(f"{kill}/metrics.json")
    for d in sorted(os.listdir(f"{kill}/ckpt")):
        w = int(d.split("=")[1])
        if w == 2:
            os.remove(f"{kill}/ckpt/{d}/manifest.json")
        elif w > 2:
            shutil.rmtree(f"{kill}/ckpt/{d}")
    for wdir in ("ledger", "waves"):
        for extra in sorted(os.listdir(f"{kill}/{wdir}")):
            if int(extra.split("=")[1]) >= 2:
                shutil.rmtree(f"{kill}/{wdir}/{extra}")

    run_crawl(seed_urls(cfg, N_SEEDS), cfg, kill, resume=True)
    k_led, k_seen, k_imgs = _collect(kill)
    assert k_led.equals(s_led)
    assert k_seen.equals(s_seen)
    assert k_imgs.equals(s_imgs)


def test_shard_chain_bounded_by_snapshot(tmp_path, ray_session):
    """Compaction waves write FULL shard snapshots: the post-compaction
    manifest's shard_chain_start moves forward, and a resume that
    replays only [chain_start..] reproduces the straight run (covered
    by test_resume_across_compaction_boundary) — here we assert the
    chain metadata itself."""
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        seed=11, budget=3, max_depth=4, max_urls=500, n_hosts=12, num_shards=4,
        compact_every=2,
    )
    out = str(tmp_path / "c")
    run_crawl(seed_urls(cfg, N_SEEDS), cfg, out)
    starts = []
    for d in sorted(os.listdir(f"{out}/ckpt")):
        with open(f"{out}/ckpt/{d}/manifest.json") as f:
            m = json.load(f)
        starts.append((m["enter_wave"], m["shard_chain_start"]))
    assert starts[0] == (0, 0)
    assert any(cs == w and w > 0 for w, cs in starts), starts  # a reset happened
    # chain start is monotone and never exceeds its wave
    assert all(cs <= w for w, cs in starts)
    assert [cs for _, cs in starts] == sorted(cs for _, cs in starts)
