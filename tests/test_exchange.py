"""Partition-exchange mechanics: tree-fold reduce correctness and the
bounded-fan-in guarantee at >=10^4 map tasks.

Map/reduce fns are defined INSIDE each test: closures cloudpickle by
value, while module-level test functions pickle by reference and fail
to import on Ray workers (tests/ is not on the worker sys.path).
"""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _make_fns():
    def map_fn(i):
        return [pa.table({"part": [p], "val": [int(i)]}) for p in range(3)]

    def reduce_fn(part, tables):
        t = pa.concat_tables(tables)
        vals = sorted(t.column("val").to_pylist())
        return (part, len(vals), sum(vals), vals[:3])

    return map_fn, reduce_fn


def test_tree_fold_matches_flat(ray_session):
    """A multi-level tree fold (fanin 4 over 37 maps -> 3 levels) must
    hand the reducer the same rows, in the same map order, as the flat
    path."""
    from searchengine_ray.stages.exchange import run_partition_exchange

    map_fn, reduce_fn = _make_fns()
    files = list(range(37))
    flat = run_partition_exchange(files, 3, map_fn, reduce_fn,
                                  reduce_fanin=None)
    tree = run_partition_exchange(files, 3, map_fn, reduce_fn,
                                  reduce_fanin=4)
    assert flat == tree
    assert sorted(r[0] for r in tree) == [0, 1, 2]
    assert all(r[1] == 37 and r[2] == sum(range(37)) for r in tree)


def test_tree_fold_preserves_map_order(ray_session):
    """Consecutive-group gathers must keep slices in submission order —
    reduce bodies that first-wins-dedup depend on it."""
    from searchengine_ray.stages.exchange import run_partition_exchange

    map_fn, _ = _make_fns()

    def reduce_order(part, tables):
        t = pa.concat_tables(tables)
        return t.column("val").to_pylist()

    got = run_partition_exchange(list(range(25)), 3, map_fn, reduce_order,
                                 reduce_fanin=3)
    assert all(vals == list(range(25)) for vals in got)


def test_exchange_bounded_at_1e4_maps(ray_session):
    """10^4 map tasks through the fold: reducers receive at most
    ``fanin`` pre-gathered tables, never a flat 10^4-argument list, and
    the fold loses no rows."""
    from searchengine_ray.stages.exchange import run_partition_exchange

    n = 10_000
    fanin = 64

    def map_one(i):
        return [pa.table({"val": [int(i)]}) for _ in range(2)]

    def reduce_count(part, tables):
        assert len(tables) <= fanin, f"flat arg list leaked: {len(tables)}"
        t = pa.concat_tables(tables)
        return (part, t.num_rows, int(np.sum(t.column("val").to_numpy())))

    got = run_partition_exchange(list(range(n)), 2, map_one, reduce_count,
                                 reduce_fanin=fanin)
    assert sorted(got) == [(0, n, sum(range(n))), (1, n, sum(range(n)))]


def test_fanin_below_two_terminates(ray_session):
    """reduce_fanin < 2 can never shrink a fold group; the exchange must
    clamp it instead of spinning forever (ADVICE r3)."""
    from searchengine_ray.stages.exchange import run_partition_exchange

    map_fn, reduce_fn = _make_fns()
    files = list(range(9))
    flat = run_partition_exchange(files, 3, map_fn, reduce_fn,
                                  reduce_fanin=None)
    one = run_partition_exchange(files, 3, map_fn, reduce_fn,
                                 reduce_fanin=1)
    assert one == flat
