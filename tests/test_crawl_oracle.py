"""Oracle-equality tests (SURVEY.md §5.2.3/4): the Ray engine's T4
crawl ledger, T5 seen dump and T3 image rows must equal the
single-threaded oracle byte-for-byte — the testable form of
BASELINE.json:6 "reproduce ... crawl ordering and final URL-seen set
exactly ... decoded-pixel allclose ... caption equality"."""

import numpy as np
import pyarrow.dataset as pads
import pytest

from lulu_crawler_ray.config import CrawlConfig, seed_urls
from lulu_crawler_ray.functions.imagecodec import decode
from lulu_crawler_ray.pipelines.oracle import run_oracle
from lulu_crawler_ray.state.seen import load_seen

CFGS = [
    CrawlConfig(seed=42, budget=4, max_depth=3, max_urls=1000, n_hosts=20, num_shards=4),
    CrawlConfig(seed=7, budget=2, max_depth=4, max_urls=150, n_hosts=8, num_shards=2),
]
N_SEEDS = [10, 5]


def _read_sorted(path, sort_cols):
    t = pads.dataset(path, format="parquet").to_table()
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[(c, "ascending") for c in sort_cols]))


def _engine_outputs(tmp_path, cfg, n_seeds, ray_session, resume=False, out=None):
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    out = out or str(tmp_path / "crawl")
    run_crawl(seed_urls(cfg, n_seeds), cfg, out, resume=resume)
    ledger = _read_sorted(f"{out}/ledger", ["rank"])
    seen = load_seen(out)
    images = _read_sorted(f"{out}/waves", ["image_id"])
    return ledger, seen, images


def _assert_equal(ledger, seen, images, oracle, cfg):
    # T4: crawl order byte-equal
    o_ledger = oracle.ledger
    assert ledger.num_rows == len(o_ledger)
    for col in ("rank", "url", "url_sha1", "wave", "host", "seq", "parent_sha1", "depth"):
        got = ledger[col].to_pylist()
        want = [r[col] for r in o_ledger]
        assert got == want, f"ledger col {col} differs"
    # T5: seen set equal
    assert seen["url_sha1"].to_pylist() == sorted(oracle.seen)
    # T3: image rows — id/caption equality + decoded-pixel equality
    o_imgs = sorted(oracle.images, key=lambda r: r["image_id"])
    assert images.num_rows == len(o_imgs)
    for i, o in enumerate(o_imgs):
        assert images["image_id"][i].as_py() == o["image_id"]
        assert images["caption"][i].as_py() == o["caption"]
        assert images["fmt"][i].as_py() == o["fmt"]
        assert images["phash"][i].as_py() == o["phash"]
        got_px = decode(images["bytes"][i].as_py(), o["fmt"])
        want_px = decode(o["bytes"], o["fmt"])
        assert np.array_equal(got_px, want_px)  # lossless => exact (PSNR inf)


@pytest.mark.parametrize("cfg,n_seeds", list(zip(CFGS, N_SEEDS)))
def test_engine_matches_oracle(tmp_path, ray_session, cfg, n_seeds):
    oracle = run_oracle(seed_urls(cfg, n_seeds), cfg)
    ledger, seen, images = _engine_outputs(tmp_path, cfg, n_seeds, ray_session)
    _assert_equal(ledger, seen, images, oracle, cfg)


def test_lossy_format_crawl_psnr(tmp_path, ray_session):
    """Crawl with the lossy ldt codec in the format universe: engine
    output still byte-equals the oracle, ldt rows actually occur, and
    every stored image decodes within the PSNR >= 40 dB fidelity gate
    vs the pristine source pixels (BASELINE.json:15 — now a REAL
    assertion, not vacuous lossless equality)."""
    from lulu_crawler_ray.functions.imagecodec import psnr
    from lulu_crawler_ray.functions.pagegen import image_pixels

    cfg = CrawlConfig(
        seed=13, budget=3, max_depth=3, max_urls=400, n_hosts=12, num_shards=2,
        image_formats=("raw", "ppm", "png", "ldt"),
    )
    oracle = run_oracle(seed_urls(cfg, 8), cfg)
    ledger, seen, images = _engine_outputs(tmp_path, cfg, 8, ray_session)
    _assert_equal(ledger, seen, images, oracle, cfg)
    assert "ldt" in set(images["fmt"].to_pylist())  # the lossy path ran
    # Fidelity vs the PRISTINE source pixels (the oracle keeps the image
    # URL, from which the synthetic universe regenerates them exactly).
    o_imgs = sorted(oracle.images, key=lambda r: r["image_id"])
    n_lossy_nonexact = 0
    for i, o in enumerate(o_imgs):
        src = image_pixels(cfg.seed, o["url"], cfg.image_sizes)
        got_px = decode(images["bytes"][i].as_py(), o["fmt"])
        if o["fmt"] == "ldt":
            assert psnr(src, got_px) >= 40.0
            if not np.array_equal(src, got_px):
                n_lossy_nonexact += 1
        else:
            assert np.array_equal(src, got_px)  # lossless => exact
    assert n_lossy_nonexact > 0  # the gate is exercised non-vacuously


def test_priority_crawl_matches_oracle(tmp_path, ray_session):
    """U2 pluggable priority (SURVEY.md §2): a non-default priority
    function (deep-first within host) flows through BOTH the engine and
    the oracle, still byte-equal — and genuinely changes crawl order vs
    the default BFS priority."""

    class DeepFirst(CrawlConfig):
        def priority(self, depth: int) -> int:
            return -depth

    base = dict(seed=42, budget=4, max_depth=3, max_urls=1000, n_hosts=20, num_shards=4)
    cfg = DeepFirst(**base)
    oracle = run_oracle(seed_urls(cfg, 10), cfg)
    ledger, seen, images = _engine_outputs(tmp_path, cfg, 10, ray_session)
    _assert_equal(ledger, seen, images, oracle, cfg)
    # priority must actually matter: order differs from the default run
    default_oracle = run_oracle(seed_urls(CrawlConfig(**base), 10), CrawlConfig(**base))
    assert [r["url"] for r in oracle.ledger] != [r["url"] for r in default_oracle.ledger]


def test_crawl_summary_digest(tmp_path, ray_session):
    """crawl_summary's one-row integer digest equals a recompute from
    the oracle crawler's ledger/image rows — the digest the driver can
    hash-check covers real crawl content and order."""
    import numpy as np

    from lulu_crawler_ray.functions.hll import _mix64
    from lulu_crawler_ray.pipelines.crawl_queries import crawl_summary

    cfg, n_seeds = CFGS[0], N_SEEDS[0]
    oracle = run_oracle(seed_urls(cfg, n_seeds), cfg)
    out = str(tmp_path / "crawl")
    _engine_outputs(tmp_path, cfg, n_seeds, ray_session, out=out)
    got = crawl_summary(out)

    M = np.uint64((1 << 63) - 1)
    with np.errstate(over="ignore"):
        sha64 = np.array(
            [int.from_bytes(r["url_sha1"][:8], "big") for r in oracle.ledger],
            np.uint64,
        )
        rank = np.array([r["rank"] for r in oracle.ledger], np.uint64)
        wave = np.array([r["wave"] for r in oracle.ledger], np.uint64)
        seq = np.array([r["seq"] for r in oracle.ledger], np.uint64)
        led = _mix64(sha64 ^ _mix64(rank) ^ _mix64(wave * np.uint64(131) + seq))
        # per-block partial masking is a no-op only blockwise; recompute
        # with a single block == engine value because masks compose: the
        # engine sums 63-bit-masked block partials in uint64 then masks.
        ph = np.array([r["phash"] for r in oracle.images], np.int64).view(np.uint64)
        w = np.array([r["w"] for r in oracle.images], np.uint64)
        h = np.array([r["h"] for r in oracle.images], np.uint64)
        img = _mix64(ph ^ _mix64(w * np.uint64(131) + h))
    assert got["n_ranks"][0].as_py() == len(oracle.ledger)
    assert got["n_images"][0].as_py() == len(oracle.images)
    assert got["n_waves"][0].as_py() == oracle.metrics["waves"]
    # wrap-around uint64 sums are associative, so the digest is exactly
    # block-split invariant — straight equality vs the oracle recompute
    with np.errstate(over="ignore"):
        want_led = int(led.sum(dtype=np.uint64) & M)
        want_img = int(img.sum(dtype=np.uint64) & M)
    assert got["ledger_digest"][0].as_py() == want_led
    assert got["image_digest"][0].as_py() == want_img


def test_max_urls_truncation(tmp_path, ray_session):
    cfg = CrawlConfig(seed=3, budget=4, max_depth=4, max_urls=30, n_hosts=10, num_shards=2)
    oracle = run_oracle(seed_urls(cfg, 6), cfg)
    assert len(oracle.ledger) <= 30
    ledger, seen, images = _engine_outputs(tmp_path, cfg, 6, ray_session)
    _assert_equal(ledger, seen, images, oracle, cfg)
