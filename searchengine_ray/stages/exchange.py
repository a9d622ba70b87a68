"""Direct partition exchange — a hash shuffle for LOW-CARDINALITY keys.

Ray Data's ``groupby(part)`` runs a general sort-based shuffle: it
materializes the whole input behind a barrier, samples boundaries,
sorts, and merges. For the build's partition exchange the key is a
known small integer (``num_doc_parts`` / ``num_term_parts`` values), so
all of that machinery is waste — at bench scale the sort barrier alone
costs more than the real work, and it is the build's serial floor.

This module is the deliberate "drop to raw Ray tasks" escape hatch
(SURVEY §2 custom-operator rule (c)): a textbook two-stage exchange,

    map:    one task per input file — read, label, split into one
            pyarrow Table PER PART (``num_returns=n_parts`` so each
            part's slice is its own object — a reducer fetches only its
            column of the matrix, never the whole map output);
    reduce: one task per part — concat that part's slices from every
            map, run the partition writer (sort/dedup/ids/sha or
            posting merge), write atomically with its manifest.

Both sides are fully parallel and pipelined by Ray's scheduler; there
is no barrier and nothing is sorted that doesn't need sorting.
Map-task granularity is one file — callers shard large corpora into
many files (the generator writes >= 8), which is also what any 100 TB
layout does. Intermediate slices live in the object store and spill to
disk under pressure, exactly like Ray Data's own shuffle blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _make_map_stats():
    import ray

    @ray.remote
    class MapStats:
        def __init__(self):
            self.sum = 0.0
            self.max = 0.0
            self.n = 0

        def add(self, sec: float) -> None:
            self.sum += sec
            self.max = max(self.max, sec)
            self.n += 1

        def get(self):
            return {"sum": self.sum, "max": self.max, "n": self.n}

    return MapStats


def run_partition_exchange(files: list[str], n_parts: int, map_fn, reduce_fn,
                           *, skip_parts: set[int] | None = None,
                           max_in_flight: int | None = None,
                           timings: dict | None = None,
                           reduce_fanin: int | None = 1024) -> list:
    """Execute the exchange; returns the (small) reduce results.

    ``map_fn(file) -> list[pa.Table]`` (length ``n_parts``);
    ``reduce_fn(part, tables) -> result`` — both must be serializable.
    ``skip_parts``: resume support — those reducers never run and map
    slices for them are dropped on the floor.
    ``timings``: pass a dict to record ``map_wall_sec``/``reduce_wall_sec``.
    Reducers can only start once every map finished (they take all map
    slices as args), so the explicit barrier this inserts changes nothing
    on a single node; it exists to decompose the exchange wall-clock into
    its map (tokenize/normalize) and reduce (merge/write) components.

    ``reduce_fanin``: above this many map tasks, each part's slices are
    folded through gather tasks in CONSECUTIVE groups of ``fanin``
    (recursively), so reducer arg lists and the driver's live ref set
    stay bounded at 10^6 maps instead of a flat maps x parts matrix.
    The fold runs incrementally during submission — full groups collapse
    to one ref as soon as they exist. Below the threshold the flat path
    is kept: a gather level costs ONE EXTRA OBJECT-STORE PASS over the
    payload, measured at +70% reduce fn-seconds when it activated on the
    ~128-map bench build — so the default (1024) keeps every
    sandbox-scale exchange flat and only giant map counts pay for the
    bound they need. ``None`` forces flat.
    """
    import time

    import ray

    skip = skip_parts or set()
    if reduce_fanin is not None and reduce_fanin < 2:
        # a fanin < 2 can never shrink a group (every "fold" is a group
        # of one), so the tree-fold loop below would spin forever
        reduce_fanin = 2

    # fn-seconds side channel: a num_cpus=0 counter actor lets map tasks
    # report in-task fn time without widening the n_parts return tuple —
    # wall vs fn_sum/cpus separates real work from scheduling/serialize
    # overhead at any width (the map-side analog of reduce_fn_sum_sec)
    stats_actor = (_make_map_stats().options(num_cpus=0).remote()
                   if timings is not None else None)

    @ray.remote(num_returns=n_parts)
    def _map(path):
        t_fn = time.time()
        out = map_fn(path)
        if stats_actor is not None:
            stats_actor.add.remote(time.time() - t_fn)
        if n_parts == 1:
            return out[0]
        return tuple(out)

    @ray.remote
    def _gather(*slices):
        # zero-copy chunk-list concat; consecutive groups keep map order
        tables = [s for s in slices if s is not None and s.num_rows > 0]
        if not tables:
            return None
        return pa.concat_tables(tables, promote_options="none")

    _timed = timings is not None

    @ray.remote
    def _reduce(part, *slices):
        t_fn = time.time()
        tables = [s for s in slices if s is not None and s.num_rows > 0]
        res = reduce_fn(part, tables)
        return (res, time.time() - t_fn) if _timed else res

    # backpressure: bound concurrently-materialized MAP OUTPUTS without
    # stalling submission (wait retires one map's worth of slices at a
    # time; waiting for large fractions of pending creates pipeline
    # bubbles at low CPU counts)
    if max_in_flight is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        max_in_flight = max(cpus * 4, 16)
    fold = (reduce_fanin if reduce_fanin is not None
            and len(files) > reduce_fanin else None)
    t0 = time.time()
    slice_refs: list[list] = [[] for _ in range(n_parts)]
    level0: list[list] = [[] for _ in range(n_parts)]
    pending: list = []
    for f in files:
        refs = _map.remote(f)
        if n_parts == 1:
            refs = [refs]
        for p in range(n_parts):
            if fold is None:
                slice_refs[p].append(refs[p])
                continue
            level0[p].append(refs[p])
            if len(level0[p]) == fold:
                # collapse the full level-0 group to ONE gather ref; its
                # inputs drop from the driver, so the live ref set stays
                # O(parts * (fanin + maps/fanin)) instead of maps * parts
                slice_refs[p].append(_gather.remote(*level0[p]))
                level0[p] = []
        pending.extend(refs)
        while len(pending) > max_in_flight * n_parts:
            ready, pending = ray.wait(pending, num_returns=min(n_parts,
                                                               len(pending)))
    if fold:
        for p in range(n_parts):
            slice_refs[p].extend(level0[p])
            # proper tree: fold consecutive groups level by level (log
            # depth), never a rolling chain (linear depth) of gathers
            while len(slice_refs[p]) > fold:
                slice_refs[p] = [
                    _gather.remote(*slice_refs[p][i:i + fold])
                    if i + 1 < min(i + fold, len(slice_refs[p]))
                    else slice_refs[p][i]
                    for i in range(0, len(slice_refs[p]), fold)]
    if timings is not None:
        while pending:
            _, pending = ray.wait(pending, num_returns=len(pending))
        timings["map_wall_sec"] = round(time.time() - t0, 3)
        ms = ray.get(stats_actor.get.remote())
        timings["map_fn_sum_sec"] = round(ms["sum"], 3)
        timings["map_fn_max_sec"] = round(ms["max"], 3)
        t0 = time.time()
    out_refs = [_reduce.remote(p, *slice_refs[p])
                for p in range(n_parts) if p not in skip]
    out = ray.get(out_refs)
    if timings is not None:
        timings["reduce_wall_sec"] = round(time.time() - t0, 3)
        # in-task fn seconds: wall - sum/cpus ≈ fetch + scheduling overhead.
        # fn time excludes Ray's arg fetch/deserialize, which runs before
        # the task body — the gap between these and the wall IS that cost.
        fn_secs = [s for _, s in out]
        out = [r for r, _ in out]
        timings["reduce_fn_sum_sec"] = round(sum(fn_secs), 3)
        timings["reduce_fn_max_sec"] = round(max(fn_secs), 3) if fn_secs else 0.0
    return out


def split_by_part(table: pa.Table, n_parts: int, part_col: str = "part"
                  ) -> list[pa.Table]:
    """Split one labeled table into per-part sub-tables (vectorized)."""
    parts = table.column(part_col).to_numpy(zero_copy_only=False)
    order = np.argsort(parts, kind="stable")
    sorted_tbl = table.take(pa.array(order))
    sorted_parts = parts[order]
    bounds = np.searchsorted(sorted_parts, np.arange(n_parts + 1))
    return [sorted_tbl.slice(bounds[p], bounds[p + 1] - bounds[p])
            for p in range(n_parts)]
