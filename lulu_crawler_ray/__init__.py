"""lulu_crawler_ray — a Ray-Data-native crawl / dedup / image-ingest engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference (``Nanrou/lulu-crawler``), built
Ray-Data-first per the authoritative spec in ``BASELINE.json`` (the
reference checkout at /root/reference is empty in this sandbox — see
SURVEY.md §0 — so BASELINE.json:6/14/15 plus SURVEY.md §3.2 are the
normative semantics, verified against a single-threaded pure-Python
oracle crawler).

Layout:
    functions/  pure-Python / numpy kernels (no Ray): URL canonicalizer,
                cuckoo filter, image codecs, phash, page generator,
                robots matcher, text stats, minhash
    sources/    readers/writers (testdata parquet, image table IO, seeds)
    state/      actor-held state: sharded seen-set, metrics, checkpoints
    stages/     map_batches stage functions / callable classes
    pipelines/  the flagship crawl wave-loop, the oracle crawler, and
                the relational/text/ANN query surface for the harness
"""

__version__ = "0.2.0"
