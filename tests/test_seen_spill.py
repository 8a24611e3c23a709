"""SpillExactStore (VERDICT r2 #8): the 10^10-capacity claim as code —
per-shard sorted disk runs probed on cuckoo positives, memory bounded
by the run buffer. Property test: admits stay exact across forced
spills; capacity test: buffer capped far below the key count."""

import hashlib

import numpy as np
import pytest
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from lulu_crawler_ray.state.seen import SpillExactStore, make_shards


def _k(i: int) -> bytes:
    return hashlib.sha1(str(i).encode()).digest()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=16),
)
def test_spill_store_matches_set_oracle(tmp_path_factory, seq, buffer_max):
    """Insert-if-absent over a duplicate-heavy random stream with a
    tiny buffer (many forced spills) must agree with a python set."""
    d = tmp_path_factory.mktemp("spill")
    store = SpillExactStore(str(d), buffer_max=buffer_max)
    oracle: set[bytes] = set()
    for i in seq:
        k = _k(i)
        present = k in store
        assert present == (k in oracle)
        if not present:
            store.add_many([k])
            oracle.add(k)
    # bulk membership over knowns and unknowns
    probe = [_k(i) for i in range(450)]
    got = store.contains_many(probe)
    want = np.array([p in oracle for p in probe])
    assert (got == want).all()
    assert store.n == len(oracle)
    assert sorted(oracle) == store.sorted_keys()
    store.close()


def test_spill_store_capacity_far_below_keys(tmp_path):
    """10k keys through a 128-key buffer: memory stays at <= 128
    buffered keys, the rest lives in sorted runs on disk, membership
    stays exact (incl. negatives), and the sorted dump is complete."""
    store = SpillExactStore(str(tmp_path / "s"), buffer_max=128)
    keys = [_k(i) for i in range(10_000)]
    for lo in range(0, 10_000, 333):  # uneven chunks across flush edges
        store.add_many(keys[lo : lo + 333])
        assert len(store.buf) <= 128
    assert store.n == 10_000
    assert len(store._mm) >= 10_000 // 128 - 1
    assert store.contains_many(keys).all()
    neg = [_k(i) for i in range(10_000, 10_500)]
    assert not store.contains_many(neg).any()
    assert store.sorted_keys() == sorted(keys)
    store.close()


def test_seen_shard_admit_exact_across_spills(ray_session, tmp_path):
    """A SeenShard with a tiny exact-store buffer: admit/contains stay
    exact across spills, and a checkpoint/restore round-trip (full
    snapshot) preserves the store byte-for-byte."""
    shard = make_shards(1, capacity_per_shard=1 << 14, buffer_max=32)[0]
    keys = [_k(i) for i in range(1_000)]
    first = ray.get(shard.admit.remote("url", keys))
    assert all(first)
    again = ray.get(shard.admit.remote("url", keys))
    assert not any(again)
    stats = ray.get(shard.spill_stats.remote("url"))
    assert stats["runs"] >= 1_000 // 32 - 1 and stats["buffer"] <= 32
    assert stats["n"] == 1_000

    ck = str(tmp_path / "ck.bin")
    ray.get(shard.checkpoint.remote(ck, True))
    shard2 = make_shards(1, capacity_per_shard=1 << 14, buffer_max=32)[0]
    ray.get(shard2.restore.remote([ck]))
    assert ray.get(shard2.dump_keys.remote("url")) == sorted(keys)
    assert not any(ray.get(shard2.admit.remote("url", keys)))
    mixed = [_k(5)] + [_k(10_000 + i) for i in range(3)]
    assert ray.get(shard2.contains.remote("url", mixed)) == [True, False, False, False]
