"""CLI — the ``ray job submit`` launch vehicle (BASELINE.json:6 "runs
via ray job submit on fixed-size multi-node clusters"):

    ray job submit -- python -m lulu_crawler_ray crawl \
        --seeds seeds.txt --out /data/crawl0 [--resume] [--budget 16] ...

Standalone invocation auto-initialises Ray (guarded — the driver/test
harness owns the session otherwise).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True)
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lulu_crawler_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run (or resume) the flagship crawl")
    c.add_argument("--seeds", required=True, help="seed list (.txt or .parquet)")
    c.add_argument("--out", required=True, help="output/checkpoint root")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--budget", type=int, default=16)
    c.add_argument("--max-depth", type=int, default=6)
    c.add_argument("--max-urls", type=int, default=100_000)
    c.add_argument("--n-hosts", type=int, default=1000)
    c.add_argument("--num-shards", type=int, default=16)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--num-cpus", type=int, default=None)
    c.add_argument("--politeness-delay", type=float, default=0.0,
                   help="min seconds between fetch starts per host (0 = off)")
    c.add_argument("--hot-host-threshold", type=int, default=10_000,
                   help="candidate count above which a host's selection splits")

    q = sub.add_parser("query", help="run a registered query at an sf dir")
    q.add_argument("name")
    q.add_argument("--sf", default="/root/testdata/sf0.01")
    q.add_argument("--num-cpus", type=int, default=None)

    args = ap.parse_args(argv)
    _ensure_ray(args.num_cpus)

    if args.cmd == "crawl":
        from .config import CrawlConfig
        from .pipelines.crawl import run_crawl
        from .sources.seeds import read_seed_list

        cfg = CrawlConfig(
            seed=args.seed, budget=args.budget, max_depth=args.max_depth,
            max_urls=args.max_urls, n_hosts=args.n_hosts, num_shards=args.num_shards,
            politeness_delay_s=args.politeness_delay,
            hot_host_threshold=args.hot_host_threshold,
        )
        res = run_crawl(read_seed_list(args.seeds), cfg, args.out, resume=args.resume)
        print(json.dumps(res["metrics"]))
        return 0

    if args.cmd == "query":
        sys.path.insert(0, ".")
        import __ray_entry__ as entrymod

        res = entrymod.queries()[args.name](args.sf)
        import pyarrow as pa
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res = pa.concat_tables(
                list(res.iter_batches(batch_format="pyarrow", batch_size=65536))
            )
        print(res)
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
