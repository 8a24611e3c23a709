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
