"""Multi-host helpers: deterministic host sharding semantics (simulated hosts)."""
import numpy as np
import pytest

from difashion_tpu.core.distributed import host_shard, initialize_distributed
from difashion_tpu.data.datasets import OutfitTable, TrainLoader


def test_host_shard_partitions_global_batch():
    batch = {
        "uids": np.arange(12),
        "outfits": np.arange(48).reshape(12, 4),
    }
    shards = [host_shard(batch, i, 4) for i in range(4)]
    # disjoint cover in order
    np.testing.assert_array_equal(
        np.concatenate([s["uids"] for s in shards]), batch["uids"]
    )
    assert all(len(s["uids"]) == 3 for s in shards)


def test_host_shard_rejects_indivisible():
    with pytest.raises(ValueError):
        host_shard({"uids": np.arange(10)}, 0, 4)


def test_host_shard_single_process_identity():
    batch = {"uids": np.arange(5)}
    out = host_shard(batch, 0, 1)
    np.testing.assert_array_equal(out["uids"], batch["uids"])


def test_initialize_distributed_single_process_noop():
    initialize_distributed(num_processes=1)  # must not raise or hang


def test_every_host_sees_same_global_order():
    """The permutation is a pure function of (seed, epoch): two 'hosts' building the
    same loader agree on the global batch, so their shards are consistent."""
    N = 64
    t = OutfitTable(
        uids=np.arange(N), oids=np.arange(N),
        outfits=np.ones((N, 4), np.int64), category=np.ones((N, 4), np.int64),
    )
    l_host0 = TrainLoader(t, batch_size=16, seed=123)
    l_host1 = TrainLoader(t, batch_size=16, seed=123)
    g0 = l_host0.batch_at(7)
    g1 = l_host1.batch_at(7)
    np.testing.assert_array_equal(g0["uids"], g1["uids"])
    s0 = host_shard(g0, 0, 2)
    s1 = host_shard(g1, 1, 2)
    # disjoint halves of the same global batch
    assert set(s0["uids"]).isdisjoint(set(s1["uids"]))
    np.testing.assert_array_equal(
        np.concatenate([s0["uids"], s1["uids"]]), g0["uids"]
    )
