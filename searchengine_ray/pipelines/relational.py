"""Relational demonstration pipelines over the TPC-H-ish driver tables.

These exercise the generic engine operators (filter, groupby aggregate
with per-batch pre-aggregation, broadcast semi/hash join, sort+limit,
time bucketing) in a SQL-checkable way. Shuffle discipline:

- aggregates pre-reduce inside ``map_batches`` (one row per key per
  batch) before the groupby, so the exchange carries keys, not rows;
- joins broadcast the small side via ``ray.put`` and probe inside
  ``map_batches`` — no shuffle join anywhere;
- money is converted to integer cents PER ROW (identical double
  expression in Ray and DuckDB), so sums are exact and order-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from searchengine_ray.pipelines.common import cents, int64_col, read


# ---- q1-style pricing summary (groupby agg with pre-aggregation) ----


def _q1_partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df["qty_c"] = cents(df["l_quantity"].to_numpy())
    df["price_c"] = cents(df["l_extendedprice"].to_numpy())
    df["disc_price_c"] = cents((df["l_extendedprice"]
                                * (1.0 - df["l_discount"])).to_numpy())
    g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty_c=("qty_c", "sum"), sum_base_c=("price_c", "sum"),
        sum_disc_c=("disc_price_c", "sum"), n=("qty_c", "size"))
    return pa.Table.from_pandas(g, preserve_index=False)


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: per (returnflag, linestatus) totals, exact cents."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount"])
    partial = ds.map_batches(_q1_partial, batch_format="pyarrow", batch_size=65536)
    return partial.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_c", alias_name="sum_qty_c"),
        Sum("sum_base_c", alias_name="sum_base_c"),
        Sum("sum_disc_c", alias_name="sum_disc_c"),
        Sum("n", alias_name="count_order"))


def pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ---- q3-style: broadcast semi-join + groupby + top-k ----


def _semi_group(df: pd.DataFrame) -> pa.Table:
    """Custkey co-group: orders whose custkey appears on the customer
    side survive, re-keyed by orderkey for the next exchange. Pandas in
    (vectorized isin), ARROW out — the rows feed the next union+shuffle
    and must not mix block types with the Arrow lineitem side."""
    seen = df.loc[df["side"] == 0, "key"].to_numpy()
    orders = df[df["side"] == 1]
    hit = orders[orders["key"].isin(set(seen))]
    okey = hit["okey"].to_numpy(np.int64)
    return pa.table({"jpart": int64_col(okey % _N_JPARTS),
                     "key": int64_col(okey),
                     "odate_us": int64_col(hit["odate_us"].to_numpy(np.int64)),
                     "rev_c": int64_col(np.zeros(len(okey), np.int64)),
                     "side": int64_col(np.zeros(len(okey), np.int64))})


def _make_topk_rev_group(k: int):
    def topk_rev_group(df: pd.DataFrame) -> pa.Table:
        """Orderkey co-group: sum lineitem revenue partials per order,
        inner-join the qualifying orders, emit the group-local top-k
        (group key ranges are disjoint, so the global top-k is a subset
        of the union of group-local top-ks). Arrow out: feeds the final
        distributed sort."""
        orders = df[df["side"] == 0]
        items = df[df["side"] == 1]
        if orders.empty or items.empty:
            j = pd.DataFrame({"key": np.array([], np.int64),
                              "rev_c": np.array([], np.int64),
                              "odate_us": np.array([], np.int64)})
        else:
            rev = items.groupby("key", as_index=False)["rev_c"].sum()
            j = orders[["key", "odate_us"]].merge(rev, on="key")
            j = j.sort_values(["rev_c", "key"], ascending=[False, True]).head(k)
        return pa.table({"o_orderkey": int64_col(j["key"].to_numpy(np.int64)),
                         "revenue_c": int64_col(j["rev_c"].to_numpy(np.int64)),
                         "odate_us": int64_col(j["odate_us"].to_numpy(np.int64))})

    return topk_rev_group


def top_orders_by_revenue(sf_dir: str, segment: str = "BUILDING", k: int = 10):
    """Revenue top-k for one customer segment (TPC-H Q3 shape) — fully
    distributed, two co-group shuffle joins, no driver materialization.

    At 100-TB scale neither the segment's customers (~20% of customer)
    nor the qualifying orderkey set is driver- or broadcast-sized, so
    both joins use the same repartition shape as ``order_lineitem_join``:

    1. custkey exchange — segment-filtered customer keys ∪ orders
       (key = custkey), one ``groupby(jpart)`` semi-join keeps
       qualifying orders and re-keys them by orderkey;
    2. orderkey exchange — qualifying orders ∪ per-batch pre-aggregated
       lineitem revenue partials, one ``groupby(jpart)`` join+sum with
       a group-local top-k trim, so the final sort sees at most
       ``_N_JPARTS * k`` rows.
    """
    def cust_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("c_mktsegment"), segment))
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        z = np.zeros(len(ck), np.int64)
        return pa.table({"jpart": int64_col(ck % _N_JPARTS),
                         "key": int64_col(ck), "okey": int64_col(z),
                         "odate_us": int64_col(z), "rev_c": int64_col(z),
                         "side": int64_col(z)})

    def orders_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        d = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"jpart": int64_col(ck % _N_JPARTS),
                         "key": int64_col(ck), "okey": int64_col(ok),
                         "odate_us": int64_col(d),
                         "rev_c": int64_col(np.zeros(len(ck), np.int64)),
                         "side": int64_col(np.ones(len(ck), np.int64))})

    def lineitem_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rc = cents(price * (1.0 - disc))
        uniq, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=rc).astype(np.int64)
        return pa.table({"jpart": int64_col(uniq % _N_JPARTS),
                         "key": int64_col(uniq),
                         "odate_us": int64_col(np.zeros(len(uniq), np.int64)),
                         "rev_c": int64_col(sums),
                         "side": int64_col(np.ones(len(uniq), np.int64))})

    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        cust_side, batch_format="pyarrow", batch_size=65536)
    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pyarrow", batch_size=65536)
    qual = cust.union(orders).groupby("jpart").map_groups(
        _semi_group, batch_format="pandas")
    items = read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lineitem_side, batch_format="pyarrow", batch_size=65536)
    topk = qual.union(items).groupby("jpart").map_groups(
        _make_topk_rev_group(k), batch_format="pandas")
    out = topk.sort(["revenue_c", "o_orderkey"],
                    descending=[True, False]).limit(k)

    def fmt(batch: pa.Table) -> pa.Table:
        dt = batch.column("odate_us").cast(pa.timestamp("us"))
        import pyarrow.compute as pc

        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "revenue_c": batch.column("revenue_c"),
                         "o_orderdate": pc.strftime(dt, "%Y-%m-%d")})

    return out.map_batches(fmt, batch_format="pyarrow")


def top_orders_by_revenue_sql(segment: str = "BUILDING", k: int = 10) -> str:
    return f"""
WITH rev AS (
  SELECT l.l_orderkey AS o_orderkey,
         CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS revenue_c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = '{segment}'
  GROUP BY l.l_orderkey)
SELECT r.o_orderkey, r.revenue_c, strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM rev r JOIN orders o ON o.o_orderkey = r.o_orderkey
ORDER BY r.revenue_c DESC, r.o_orderkey ASC LIMIT {k}
"""


# ---- Bloom-filter semi-join (shuffle-avoidance join strategy) ----
#
# The classic big-data join accelerator (bloom-join; Spark's runtime
# row-group pruning, Impala/Hive runtime filters): build a BOUNDED
# Bloom filter over the small side's join keys, broadcast it, and
# prune the FACT table's rows before they enter the exact-join
# exchange. The filter admits false positives only, and the exact
# co-group join removes them — so the result is EXACT (the plain-SQL
# semi-join) while the shuffle carries ~selectivity x fact rows
# instead of all of them. The filter is deliberately small (m = 1 KiB
# of bits) so the false-positive path is actually exercised at gate
# scale — the ``bloom_semi_join_stats`` face hash-verifies the
# pass/match/false-positive accounting, proving both the pruning and
# the exactness.

_BSJ_M = 1024                     # bits
_BSJ_K = 4                        # salted md5 hash rows
_BSJ_SEGMENT = "AUTOMOBILE"


def _bsj_bit(j: int, key: int) -> int:
    """Bit of ``key`` in hash row ``j``: md5 low-64 of 'j:key' (==
    DuckDB ``md5_number_lower(j || ':' || key)``) mod m."""
    import hashlib

    h = hashlib.md5(f"{j}:{key}".encode("utf-8")).digest()
    return int.from_bytes(h[8:16], "little") % _BSJ_M


def _bsj_build(sf_dir: str, segment: str) -> np.ndarray:
    """Merged bloom over the segment's custkeys — per-batch partial
    bit rows (m/8 bytes each) OR-folded on the driver, the
    term_bloom_bits shape: the shuffle carries 128 B per batch, never
    the keys."""
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("c_mktsegment"), segment))
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        bits = np.zeros(_BSJ_M, dtype=bool)
        for key in np.unique(ck).tolist():
            for j in range(_BSJ_K):
                bits[_bsj_bit(j, int(key))] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})

    ds = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)
    acc = np.zeros(_BSJ_M // 8, dtype=np.uint8)
    for b in ds.iter_batches(batch_format="pyarrow"):
        for buf in b.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
    return np.unpackbits(acc).astype(bool)


def _bsj_pass_mask(ck: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Vector bloom-membership per row, hashed once per DISTINCT key."""
    uniq, inv = np.unique(ck, return_inverse=True)
    ok = np.fromiter(
        (all(bits[_bsj_bit(j, int(k))] for j in range(_BSJ_K))
         for k in uniq.tolist()),
        dtype=bool, count=len(uniq))
    return ok[inv]


def _bsj_probe(sf_dir: str, segment: str, bits_ref):
    """Bloom-pruned orders rows ∪ segment custkey rows, co-grouped on
    ``custkey % _N_JPARTS`` for the exact verify."""
    import ray

    def orders_side(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        keep = _bsj_pass_mask(ck, bits)
        ck = ck[keep]
        prio = np.asarray(batch.column("o_orderpriority").to_pylist(),
                          dtype=object)[keep]
        pc_ = cents(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False))[keep]
        return pa.table({"jpart": int64_col(ck % _N_JPARTS),
                         "key": int64_col(ck),
                         "prio": pa.array(prio, pa.string()),
                         "price_c": int64_col(pc_),
                         "side": int64_col(np.ones(len(ck), np.int64))})

    def cust_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("c_mktsegment"), segment))
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        z = np.zeros(len(ck), np.int64)
        return pa.table({"jpart": int64_col(ck % _N_JPARTS),
                         "key": int64_col(ck),
                         "prio": pa.array([""] * len(ck), pa.string()),
                         "price_c": int64_col(z), "side": int64_col(z)})

    orders = read(sf_dir, "orders",
                  ["o_custkey", "o_orderpriority", "o_totalprice"])         .map_batches(orders_side, batch_format="pyarrow", batch_size=65536)
    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])         .map_batches(cust_side, batch_format="pyarrow", batch_size=65536)
    return cust.union(orders).groupby("jpart")


def bloom_semi_join(sf_dir: str, segment: str = _BSJ_SEGMENT,
                    bits_ref=None):
    """(o_orderpriority, n_orders, sum_price_c) over orders whose
    customer is in ``segment`` — EXACT result (identical to the plain
    SQL semi-join), computed with the bloom-prune-then-verify shape:
    only orders passing the broadcast 1 KiB bloom enter the custkey
    exchange; the co-group isin verify removes the false positives;
    per-group partial (prio, count, sum) rows feed one tiny final
    groupby. ``bits_ref`` lets a caller that already built the filter
    (the stats face) pass it in instead of re-scanning customer."""
    import ray
    from ray.data.aggregate import Sum

    if bits_ref is None:
        bits_ref = ray.put(_bsj_build(sf_dir, segment))

    def verify_group(df: pd.DataFrame) -> pa.Table:
        seen = set(df.loc[df["side"] == 0, "key"].to_numpy().tolist())
        orders = df[df["side"] == 1]
        hit = orders[orders["key"].isin(seen)]
        g = hit.groupby("prio").agg(
            n_p=("key", "size"), s_p=("price_c", "sum")).reset_index()
        return pa.table({"prio": pa.array(g["prio"], pa.string()),
                         "n_p": int64_col(g["n_p"].to_numpy(np.int64)),
                         "s_p": int64_col(g["s_p"].to_numpy(np.int64))})

    parts = _bsj_probe(sf_dir, segment, bits_ref).map_groups(
        verify_group, batch_format="pandas")
    out = parts.groupby("prio").aggregate(
        Sum("n_p", alias_name="n_orders"),
        Sum("s_p", alias_name="sum_price_c"))
    return out.map_batches(lambda b: pa.table(
        {"o_orderpriority": b.column("prio"),
         "n_orders": b.column("n_orders"),
         "sum_price_c": b.column("sum_price_c")}), batch_format="pyarrow")


def bloom_semi_join_sql(segment: str = _BSJ_SEGMENT) -> str:
    """The bloom is invisible to the exact result: plain semi-join."""
    return f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_price_c
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{segment}'
GROUP BY o.o_orderpriority
"""


def bloom_semi_join_stats(sf_dir: str, segment: str = _BSJ_SEGMENT):
    """(n_orders, n_pass_bloom, n_match, n_false_pos) — the pruning
    accounting, itself a deterministic integer function of the salted
    md5 bloom, so it hash-verifies against a SQL replay of the SAME
    bit math: how many order rows the filter admitted, how many the
    exact verify kept, and the false positives the verify removed."""
    import ray
    from ray.data.aggregate import Sum

    bits = _bsj_build(sf_dir, segment)
    bits_ref = ray.put(bits)

    def count_partial(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        keep = _bsj_pass_mask(ck, b)
        return pa.table({"n_p": int64_col(np.array([len(ck)], np.int64)),
                         "p_p": int64_col(np.array([int(keep.sum())],
                                                   np.int64))})

    counts = read(sf_dir, "orders", ["o_custkey"]).map_batches(
        count_partial, batch_format="pyarrow", batch_size=65536)         .aggregate(Sum("n_p", alias_name="n"), Sum("p_p", alias_name="p"))
    joined = bloom_semi_join(sf_dir, segment,
                             bits_ref=bits_ref).to_pandas()
    n_match = int(joined["n_orders"].sum())
    n, p = int(counts["sum(n_p)"] if "sum(n_p)" in counts else counts["n"]),         int(counts["sum(p_p)"] if "sum(p_p)" in counts else counts["p"])
    return pa.table({
        "n_orders": int64_col(np.array([n], np.int64)),
        "n_pass_bloom": int64_col(np.array([p], np.int64)),
        "n_match": int64_col(np.array([n_match], np.int64)),
        "n_false_pos": int64_col(np.array([p - n_match], np.int64))})


def bloom_semi_join_stats_sql(segment: str = _BSJ_SEGMENT) -> str:
    return f"""
WITH seg AS (
  SELECT DISTINCT c_custkey FROM customer
  WHERE c_mktsegment = '{segment}'),
bits AS (
  SELECT DISTINCT
         CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' ||
                                    CAST(c_custkey AS VARCHAR))
                   AS UHUGEINT) % {_BSJ_M} AS BIGINT) AS bit
  FROM seg CROSS JOIN range(0, {_BSJ_K}) j(j)),
ck AS (SELECT DISTINCT o_custkey FROM orders),
probe AS (
  SELECT ck.o_custkey,
         CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' ||
                                    CAST(ck.o_custkey AS VARCHAR))
                   AS UHUGEINT) % {_BSJ_M} AS BIGINT) AS bit
  FROM ck CROSS JOIN range(0, {_BSJ_K}) j(j)),
pass AS (
  SELECT p.o_custkey
  FROM probe p JOIN bits b ON b.bit = p.bit
  GROUP BY p.o_custkey HAVING count(*) = {_BSJ_K}),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CASE WHEN pass.o_custkey IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
         CAST(sum(CASE WHEN seg.c_custkey IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_match
  FROM orders o
  LEFT JOIN pass ON pass.o_custkey = o.o_custkey
  LEFT JOIN seg ON seg.c_custkey = o.o_custkey)
SELECT n_orders, n_pass_bloom, n_match,
       CAST(n_pass_bloom - n_match AS BIGINT) AS n_false_pos
FROM agg
"""


# ---- events: time-bucketed aggregate (streaming-shaped workload) ----


def _events_partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
    df["v_c"] = cents(df["value"].to_numpy())
    g = df.groupby(["event_type", "day"], as_index=False).agg(
        n=("v_c", "size"), min_v=("v_c", "min"), max_v=("v_c", "max"))
    return pa.Table.from_pandas(g, preserve_index=False)


def events_daily(sf_dir: str):
    """(event_type, day, n_events, min/max value cents) — tumbling daily
    window as a pre-aggregated groupby (SURVEY §2.9: the reference has
    no streaming ops; this is the streaming-shaped batch analog)."""
    from ray.data.aggregate import Max, Min, Sum

    ds = read(sf_dir, "events", ["event_type", "ts", "value"])
    partial = ds.map_batches(_events_partial, batch_format="pyarrow",
                             batch_size=65536)
    return partial.groupby(["event_type", "day"]).aggregate(
        Sum("n", alias_name="n_events"),
        Min("min_v", alias_name="min_value_c"),
        Max("max_v", alias_name="max_value_c"))


def events_daily_sql() -> str:
    return """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_value_c,
       CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_value_c
FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
"""


def events_rollup(sf_dir: str):
    """(event_type, day, n_events, sum_value_c) at every ROLLUP level —
    (type, day), per-type subtotal, grand total — with ``__all__`` as
    the rolled-up sentinel (NULL-free so the driver's value hash is
    stable across engines).

    The OLAP subtotal operator the relational surface lacked. Shape:
    per-batch partials → ONE (type, day) groupby; the subtotal and
    grand-total levels re-aggregate the LEVEL-0 RESULT — group-key
    cardinality (types × days), corpus-size-independent — so raw
    events cross the exchange exactly once and the higher levels are
    free at any scale. Sums are integer cents: associative, exact,
    order-independent."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        df["v_c"] = cents(df["value"].to_numpy())
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            n=("v_c", "size"), sv=("v_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    l0 = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536) \
           .groupby(["event_type", "day"]).aggregate(
               Sum("n", alias_name="n_events"),
               Sum("sv", alias_name="sum_value_c"))

    def finish_l0(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": batch.column("day"),
            "n_events": batch.column("n_events").cast(pa.int64()),
            "sum_value_c": batch.column("sum_value_c").cast(pa.int64())})

    l0 = l0.map_batches(finish_l0, batch_format="pyarrow")

    l1 = l0.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n1"), Sum("sum_value_c", alias_name="s1"))

    def finish_l1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": pa.array(["__all__"] * n),
            "n_events": batch.column("n1").cast(pa.int64()),
            "sum_value_c": batch.column("s1").cast(pa.int64())})

    l1 = l1.map_batches(finish_l1, batch_format="pyarrow")

    l2 = l1.map_batches(lambda b: pa.table({
        "event_type": pa.array(["__all__"] * b.num_rows),
        "day": pa.array(["__all__"] * b.num_rows),
        "n_events": b.column("n_events"),
        "sum_value_c": b.column("sum_value_c")}), batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(
            Sum("n_events", alias_name="n2"),
            Sum("sum_value_c", alias_name="s2")) \
        .map_batches(lambda b: pa.table({
            "event_type": b.column("event_type"),
            "day": b.column("day"),
            "n_events": b.column("n2").cast(pa.int64()),
            "sum_value_c": b.column("s2").cast(pa.int64())}),
            batch_format="pyarrow")

    return l0.union(l1).union(l2)


def events_rollup_sql() -> str:
    return """
WITH base AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events)
SELECT COALESCE(event_type, '__all__') AS event_type,
       COALESCE(day, '__all__') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(v_c) AS BIGINT) AS sum_value_c
FROM base GROUP BY ROLLUP(event_type, day)
"""


# ---- sort + limit ----


def top_parts(sf_dir: str, k: int = 20):
    """Top-k parts by retail price (sort desc + deterministic tie-break)."""
    ds = read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": batch.column("p_partkey"),
            "p_name": batch.column("p_name"),
            "price_c": int64_col(cents(
                batch.column("p_retailprice").to_numpy(zero_copy_only=False))),
        })

    out = ds.map_batches(to_cents, batch_format="pyarrow") \
            .sort(["price_c", "p_partkey"], descending=[True, False]) \
            .limit(k)
    return out


def top_parts_sql(k: int = 20) -> str:
    return f"""
SELECT p_partkey, p_name,
       CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
FROM part ORDER BY price_c DESC, p_partkey ASC LIMIT {k}
"""


# ---- broadcast dimension join + aggregate ----


def suppliers_by_nation(sf_dir: str):
    """supplier x nation broadcast hash join -> per-nation stats."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    order = np.argsort(nation.n_nationkey.to_numpy())
    nmap_ref = ray.put((nation.n_nationkey.to_numpy()[order].astype(np.int64),
                        nation.n_name.to_numpy()[order].astype(object)))

    class JoinNation:
        def __init__(self, ref):
            self.nkeys, self.nnames = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            nk = batch.column("s_nationkey").to_numpy(zero_copy_only=False)
            bal = batch.column("s_acctbal").to_numpy(zero_copy_only=False)
            # vectorized dictionary lookup: searchsorted over the sorted
            # broadcast key array, then one fancy-index gather
            pos = np.searchsorted(self.nkeys, nk)
            # clip BEFORE probing: a key above the max would IndexError
            # out of the gather instead of reaching the diagnostic
            pos = np.minimum(pos, len(self.nkeys) - 1)
            if not np.array_equal(self.nkeys[pos], nk):
                raise KeyError("s_nationkey missing from nation table")
            return pa.table({
                "n_name": pa.array(self.nnames[pos], pa.string()),
                "bal_c": int64_col(cents(bal)),
            })

    ds = read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    joined = ds.map_batches(JoinNation, fn_constructor_args=(nmap_ref,),
                            batch_format="pyarrow", concurrency=(1, 2))
    return joined.groupby("n_name").aggregate(
        Count(alias_name="n_suppliers"), Sum("bal_c", alias_name="total_acctbal_c"))


def suppliers_by_nation_sql() -> str:
    return """
SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_acctbal_c
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
"""


# ---- distinct ----


def segment_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return read(sf_dir, "customer", ["c_mktsegment"]).groupby(
        "c_mktsegment").aggregate(Count(alias_name="n_customers"))


def segment_counts_sql() -> str:
    return """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer GROUP BY c_mktsegment
"""


# ---- big-big co-group shuffle join (no broadcastable side) ----

_N_JPARTS = 64


def _join_group(df: pd.DataFrame) -> pd.DataFrame:
    """One join partition: split the unioned rows back into sides, hash
    join on the key, emit per-month partials (month, n_orders, rev)."""
    orders = df[df["side"] == 0]
    items = df[df["side"] == 1]
    if orders.empty or items.empty:
        return pd.DataFrame({"month": np.array([], dtype=np.int64),
                             "n_orders": np.array([], dtype=np.int64),
                             "revenue_cents": np.array([], dtype=np.int64)})
    rev = items.groupby("key", as_index=False)["rev_c"].sum()
    j = orders[["key", "month"]].merge(rev, on="key")
    out = j.groupby("month", as_index=False).agg(
        n_orders=("key", "size"), revenue_cents=("rev_c", "sum"))
    return out.astype({"month": np.int64, "n_orders": np.int64,
                       "revenue_cents": np.int64})


def order_lineitem_join(sf_dir: str):
    """(month, n_orders, revenue_cents) — revenue per order month via a
    BIG-BIG repartition join of orders with lineitem.

    Neither side is broadcastable at scale, so this is the co-group
    shuffle join shape: both tables map to one unioned schema tagged
    with ``side`` and a shared hash-partition key (``o_orderkey %
    _N_JPARTS``), ONE ``groupby(jpart)`` co-locates matching keys, and
    a vectorized pandas hash-join runs per partition. Lineitem rows are
    pre-aggregated to (orderkey, cents) inside ``map_batches`` BEFORE
    the shuffle — the exchange carries one row per (batch, orderkey),
    never raw line items. A tiny final groupby folds the per-partition
    month partials.
    """
    from ray.data.aggregate import Count, Sum

    def orders_side(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        d = d.astype("datetime64[M]")
        month = (d.astype(np.int64) + 12 * 1970)  # months since year 0
        y, m = month // 12, month % 12 + 1
        return pa.table({"jpart": int64_col(k % _N_JPARTS),
                         "key": int64_col(k),
                         "month": int64_col(y * 100 + m),
                         "rev_c": int64_col(np.zeros(len(k), np.int64)),
                         "side": int64_col(np.zeros(len(k), np.int64))})

    def lineitem_side(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rc = cents(price * (1.0 - disc))
        uniq, inv = np.unique(k, return_inverse=True)
        sums = np.bincount(inv, weights=rc).astype(np.int64)
        return pa.table({"jpart": int64_col(uniq % _N_JPARTS),
                         "key": int64_col(uniq),
                         "month": int64_col(np.zeros(len(uniq), np.int64)),
                         "rev_c": int64_col(sums),
                         "side": int64_col(np.ones(len(uniq), np.int64))})

    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pyarrow", batch_size=65536)
    items = read(sf_dir, "lineitem",
                 ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lineitem_side, batch_format="pyarrow", batch_size=65536)
    partial = orders.union(items).groupby("jpart").map_groups(
        _join_group, batch_format="pandas")
    return partial.groupby("month").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents"))


def order_lineitem_join_sql() -> str:
    return """
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS month,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(rev_c) AS BIGINT) AS revenue_cents
FROM orders JOIN (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
              AS BIGINT) AS rev_c
  FROM lineitem) li ON li.l_orderkey = o_orderkey
GROUP BY year(o_orderdate), month(o_orderdate)
"""


# ---- co-group anti-join (NOT EXISTS with no broadcastable side) ----


def _anti_group(df: pd.DataFrame) -> pd.DataFrame:
    cust = df[df["side"] == 0]
    seen = set(df.loc[df["side"] == 1, "key"].to_numpy())
    miss = cust[~cust["key"].isin(seen)]
    out = miss.groupby("seg", as_index=False).agg(n_p=("key", "size"))
    return out.astype({"n_p": np.int64})


_INACTIVE_CUTOFF = "2001-01-01"


def customers_without_orders(sf_dir: str, cutoff: str = _INACTIVE_CUTOFF):
    """(c_mktsegment, n_customers) — customers with NO order on/after
    ``cutoff`` (inactive customers), counted per segment.

    The distributed anti-join (NOT EXISTS) shape: at scale neither the
    customer keys nor the distinct order custkeys are broadcastable, so
    both sides hash-partition on the key (orders date-filtered and
    pre-deduped to distinct keys per batch BEFORE the shuffle), one
    ``groupby(jpart)`` co-locates them, and the per-partition body is a
    vectorized set difference. Tiny final sum groupby.
    """
    from ray.data.aggregate import Sum

    cut_us = np.datetime64(cutoff, "us").astype(np.int64)

    def cust_side(batch: pa.Table) -> pa.Table:
        k = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        return pa.table({"jpart": int64_col(k % _N_JPARTS),
                         "key": int64_col(k),
                         "seg": batch.column("c_mktsegment"),
                         "side": int64_col(np.zeros(len(k), np.int64))})

    def order_side(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        k = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        k = np.unique(k[d >= cut_us])
        return pa.table({"jpart": int64_col(k % _N_JPARTS),
                         "key": int64_col(k),
                         "seg": pa.array([""] * len(k), pa.string()),
                         "side": int64_col(np.ones(len(k), np.int64))})

    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        cust_side, batch_format="pyarrow", batch_size=65536)
    orders = read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        order_side, batch_format="pyarrow", batch_size=65536)
    partial = cust.union(orders).groupby("jpart").map_groups(
        _anti_group, batch_format="pandas")
    out = partial.groupby("seg").aggregate(Sum("n_p", alias_name="n_customers"))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["c_mktsegment", "n_customers"])

    return out.map_batches(rename, batch_format="pyarrow")


def customers_without_orders_sql(cutoff: str = _INACTIVE_CUTOFF) -> str:
    return f"""
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY c_mktsegment
"""


# ---- RFM customer segmentation ----

_RFM_QS = (0.2, 0.4, 0.6, 0.8)
_RFM_DAY_US = 86400 * 1_000_000


def _rfm_partial(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df["last_us"] = df["o_orderdate"].astype("datetime64[us]") \
        .astype("int64")
    df["m_c"] = cents(df["o_totalprice"].to_numpy())
    g = df.groupby("o_custkey", as_index=False).agg(
        last_p=("last_us", "max"), f_p=("o_orderkey", "size"),
        m_p=("m_c", "sum"))
    return pa.table({"ck": int64_col(g["o_custkey"].to_numpy(np.int64)),
                     "last_p": int64_col(g["last_p"].to_numpy(np.int64)),
                     "f_p": int64_col(g["f_p"].to_numpy(np.int64)),
                     "m_p": int64_col(g["m_p"].to_numpy(np.int64))})


def _disc_thresholds(vals: np.ndarray, cnts: np.ndarray,
                     qs=_RFM_QS) -> list[int]:
    """quantile_disc thresholds from a (value, count) histogram — the
    doclen_quantiles selection rule (rank ceil(q*n) over the ascending
    multiset)."""
    order = np.argsort(vals)
    v, c = vals[order], cnts[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    return [int(v[int(np.searchsorted(cum, min(int(np.ceil(q * n)), n)))])
            for q in qs]


def rfm_segments(sf_dir: str):
    """(r_q, f_q, m_q, n_customers) — RFM segmentation: every customer
    bucketed into quintiles of Recency (days since their last order,
    relative to the corpus's max order date), Frequency (order count)
    and Monetary (lifetime spend in cents), counted per (r,f,m) cell —
    the classic CRM segmentation cube (5³ cells max). Buckets are
    VALUE-based against exact quantile_disc thresholds (values equal
    to a threshold fall in the lower bucket), so no global rank sort
    exists anywhere: one custkey groupby builds per-customer
    aggregates from per-batch partials, per-dimension histograms
    reduce to 4 thresholds each via the doclen_quantiles selection,
    the 12 ints broadcast, and a final partial-count pass emits the
    cube. All integer (days, counts, cents) end to end."""
    import ray
    from ray.data.aggregate import Max, Sum

    ds = read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_totalprice"])
    cust = ds.map_batches(_rfm_partial, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("ck").aggregate(Max("last_p", alias_name="last_us"),
                                 Sum("f_p", alias_name="f"),
                                 Sum("m_p", alias_name="m")) \
        .materialize()
    mx = int(cust.max("last_us"))

    def add_r(batch: pa.Table) -> pa.Table:
        last = batch.column("last_us").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "r_days", pa.array((mx - last) // _RFM_DAY_US, pa.int64()))

    cust = cust.map_batches(add_r, batch_format="pyarrow").materialize()

    def hist(col: str):
        def f(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            uq, cnt = np.unique(v, return_counts=True)
            return pa.table({"v": int64_col(uq),
                             "c_p": int64_col(cnt.astype(np.int64))})

        f.__name__ = f"hist_{col}"
        return f

    ths = {}
    for col in ("r_days", "f", "m"):
        rows = cust.map_batches(hist(col), batch_format="pyarrow") \
            .groupby("v").aggregate(Sum("c_p", alias_name="c")).take_all()
        vals = np.array([r["v"] for r in rows], np.int64)
        cnts = np.array([r["c"] for r in rows], np.int64)
        ths[col] = _disc_thresholds(vals, cnts)

    def bucketize(batch: pa.Table) -> pa.Table:
        out = {}
        for col, name in (("r_days", "r_q"), ("f", "f_q"), ("m", "m_q")):
            v = batch.column(col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            q = np.ones(len(v), np.int64)
            for t in ths[col]:
                q += (v > t)
            out[name] = q
        # base-6 packing: quintiles are 1..5, so base 5 would collide
        key = out["r_q"] * 36 + out["f_q"] * 6 + out["m_q"]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"r_q": int64_col(uk // 36),
                         "f_q": int64_col((uk % 36) // 6),
                         "m_q": int64_col(uk % 6),
                         "n_p": int64_col(cnt.astype(np.int64))})

    return cust.map_batches(bucketize, batch_format="pyarrow") \
        .groupby(["r_q", "f_q", "m_q"]) \
        .aggregate(Sum("n_p", alias_name="n_customers"))


def rfm_segments_sql() -> str:
    qs = ", ".join(str(q) for q in _RFM_QS)

    def bucket(col: str, th: str) -> str:
        return (f"1 + CAST({col} > {th}[1] AS BIGINT)"
                f" + CAST({col} > {th}[2] AS BIGINT)"
                f" + CAST({col} > {th}[3] AS BIGINT)"
                f" + CAST({col} > {th}[4] AS BIGINT)")

    return f"""
WITH c AS (
  SELECT o_custkey AS ck, max(epoch_us(o_orderdate)) AS last_us,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS m
  FROM orders GROUP BY o_custkey),
mx AS (SELECT max(last_us) AS mu FROM c),
d AS (SELECT ck, (mx.mu - last_us) // {_RFM_DAY_US} AS r_days, f, m
      FROM c CROSS JOIN mx),
th AS (SELECT quantile_disc(r_days, [{qs}]) AS tr,
              quantile_disc(f, [{qs}]) AS tf,
              quantile_disc(m, [{qs}]) AS tm
       FROM d),
seg AS (
  SELECT CAST({bucket("d.r_days", "th.tr")} AS BIGINT) AS r_q,
         CAST({bucket("d.f", "th.tf")} AS BIGINT) AS f_q,
         CAST({bucket("d.m", "th.tm")} AS BIGINT) AS m_q
  FROM d CROSS JOIN th)
SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers
FROM seg GROUP BY r_q, f_q, m_q
"""


# ---- TPC-H Q5 shape: multi-way join (2 co-group shuffles + broadcasts) ----

_Q5_REGION = "ASIA"
_Q5_FROM = "1997-01-01"
_Q5_TO = "1998-01-01"


def nation_volume(sf_dir: str, region: str = _Q5_REGION,
                  date_from: str = _Q5_FROM, date_to: str = _Q5_TO):
    """(n_name, revenue_c) — local-supplier volume (TPC-H Q5 shape):
    revenue of lineitems in ``region`` whose customer and supplier share
    a nation, for orders inside the date window. The 6-table join class
    (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) the
    two-table joins above don't exercise.

    Scale shape: nation/region and supplier broadcast once via
    ``ray.put`` (supplier is ~1e-4 of lineitem at TPC-H ratios; if it
    outgrows broadcast, the lineitem map's suppkey lookup becomes a
    third co-group exchange with the same body). The two BIG joins are
    co-group shuffles: (1) region-filtered customers ∪ date-filtered
    orders co-locate on custkey — qualifying orders re-key by orderkey
    carrying the customer's nation; (2) those ∪ lineitem revenue
    partials co-locate on orderkey — lineitem rows map suppkey →
    supplier nation from the broadcast, drop non-region suppliers AT
    THE SOURCE, and pre-aggregate to (orderkey, supp_nation, cents)
    per batch, so the exchange never carries raw line items. The
    c_nationkey = s_nationkey predicate is the in-group merge key
    beside orderkey; a tiny final groupby folds per-nation cents
    (exact integers, order-free)."""
    import ray
    from ray.data.aggregate import Sum

    nat = read(sf_dir, "nation",
               ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg.r_name == region, "r_regionkey"].tolist())
    nat = nat[nat.n_regionkey.isin(rkeys)]
    order = np.argsort(nat.n_nationkey.to_numpy())
    region_nk = nat.n_nationkey.to_numpy()[order].astype(np.int64)
    region_names = nat.n_name.to_numpy()[order].astype(object)

    sup = read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sorder = np.argsort(sup.s_suppkey.to_numpy())
    sup_ref = ray.put((sup.s_suppkey.to_numpy()[sorder].astype(np.int64),
                       sup.s_nationkey.to_numpy()[sorder].astype(np.int64)))
    t_from = np.datetime64(date_from, "us").astype(np.int64)
    t_to = np.datetime64(date_to, "us").astype(np.int64)

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = batch.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, region_nk)
        ck, nk = ck[keep], nk[keep]
        z = np.zeros(len(ck), np.int64)
        return pa.table({"jpart": int64_col(ck % _N_JPARTS),
                         "key": int64_col(ck), "nk": int64_col(nk),
                         "okey": int64_col(z),
                         "side": int64_col(z)})

    def orders_side(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (d >= t_from) & (d < t_to)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)[keep]
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)[keep]
        return pa.table({"jpart": int64_col(ck % _N_JPARTS),
                         "key": int64_col(ck),
                         "nk": int64_col(np.zeros(len(ck), np.int64)),
                         "okey": int64_col(ok),
                         "side": int64_col(np.ones(len(ck), np.int64))})

    def cust_order_group(df: pd.DataFrame) -> pa.Table:
        cust = df[df["side"] == 0]
        orders = df[df["side"] == 1]
        j = orders[["key", "okey"]].merge(cust[["key", "nk"]], on="key")
        ok = j["okey"].to_numpy(np.int64)
        return pa.table({"jpart": int64_col(ok % _N_JPARTS),
                         "key": int64_col(ok),
                         "nk": int64_col(j["nk"].to_numpy(np.int64)),
                         "rev_c": int64_col(np.zeros(len(ok), np.int64)),
                         "side": int64_col(np.zeros(len(ok), np.int64))})

    class LineitemSide:
        def __init__(self, ref):
            self.skeys, self.snk = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            price = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)
            disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(self.skeys, sk),
                             len(self.skeys) - 1)
            if not np.array_equal(self.skeys[pos], sk):
                raise KeyError("l_suppkey missing from supplier table")
            nk = self.snk[pos]
            keep = np.isin(nk, region_nk)
            rc = cents((price * (1.0 - disc)))[keep]
            key = ok[keep] * 32 + nk[keep]       # nationkey < 25 < 32
            uniq, inv = np.unique(key, return_inverse=True)
            sums = np.bincount(inv, weights=rc).astype(np.int64)
            uok, unk = uniq // 32, uniq % 32
            return pa.table({"jpart": int64_col(uok % _N_JPARTS),
                             "key": int64_col(uok),
                             "nk": int64_col(unk),
                             "rev_c": int64_col(sums),
                             "side": int64_col(np.ones(len(uok), np.int64))})

    def rev_group(df: pd.DataFrame) -> pd.DataFrame:
        orders = df[df["side"] == 0]
        items = df[df["side"] == 1]
        if orders.empty or items.empty:
            return pd.DataFrame({"nk": np.array([], np.int64),
                                 "rev_p": np.array([], np.int64)})
        j = items[["key", "nk", "rev_c"]].merge(
            orders[["key", "nk"]], on=["key", "nk"])
        out = j.groupby("nk", as_index=False).agg(rev_p=("rev_c", "sum"))
        return out.astype({"nk": np.int64, "rev_p": np.int64})

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_side, batch_format="pyarrow", batch_size=65536)
    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pyarrow", batch_size=65536)
    qual = cust.union(orders).groupby("jpart").map_groups(
        cust_order_group, batch_format="pandas")
    items = read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"]).map_batches(
        LineitemSide, fn_constructor_args=(sup_ref,),
        batch_format="pyarrow", batch_size=65536, concurrency=(1, 4))
    partial = qual.union(items).groupby("jpart").map_groups(
        rev_group, batch_format="pandas")
    total = partial.groupby("nk").aggregate(Sum("rev_p", alias_name="revenue_c"))

    def to_name(batch: pa.Table) -> pa.Table:
        nk = batch.column("nk").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(region_nk, nk), len(region_nk) - 1)
        return pa.table({"n_name": pa.array(region_names[pos], pa.string()),
                         "revenue_c": batch.column("revenue_c").cast(
                             pa.int64())})

    return total.map_batches(to_name, batch_format="pyarrow")


def nation_volume_sql(region: str = _Q5_REGION, date_from: str = _Q5_FROM,
                      date_to: str = _Q5_TO) -> str:
    return f"""
SELECT n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{region}'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '{date_from}'
  AND o.o_orderdate < TIMESTAMP '{date_to}'
GROUP BY n.n_name
"""


def events_daily_users(sf_dir: str):
    """(event_type, day, n_users) — EXACT daily active users per event
    type: the exact COUNT(DISTINCT) groupby class (the approximate twin
    is `window_user_hll`; production dashboards run both and alert on
    divergence).

    Shape: the canonical two-stage distinct aggregation — per-batch
    LOCAL dedup of (type, day, user) triples (each batch contributes a
    distinct triple at most once, so the shuffle carries the distinct
    cardinality, not the event count), ONE triple groupby to finish the
    global dedup, then a map-side re-count per (type, day) folded by a
    second key-cardinality groupby. Raw events never shuffle; the wide
    exchanges both run over distinct-key-scale rows."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_type", "ts", "user_id"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        u = df[["event_type", "day", "user_id"]].drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    triples = ds.map_batches(distinct_partial, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby(["event_type", "day", "user_id"]).count()

    def recount(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby(["event_type", "day"]).size() \
            .rename("n_p").reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    return triples.map_batches(recount, batch_format="pyarrow") \
        .groupby(["event_type", "day"]) \
        .aggregate(Sum("n_p", alias_name="n_users"))


def events_daily_users_sql() -> str:
    return """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
"""


# ---- table profiling (DuckDB SUMMARIZE class) ----

_PROFILE_COLS: list[tuple[str, list[str]]] = [
    ("lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
    ("events", ["value"]),
]


def table_profile(sf_dir: str):
    """(col, n_rows, n_nulls, n_distinct, min_bp, max_bp) — per-column
    data profiling over the numeric measure columns (the DESCRIBE /
    DuckDB-SUMMARIZE class every warehouse exposes; the first stage of
    any data-quality audit on a new drop).

    Shape: count/null/min/max fold from per-batch PARTIALS (one row per
    column per batch through the groupby — the exchange carries
    O(columns x batches) rows, never data). Exact distinct counts go
    through a (col, value) groupby whose input is deduped per batch
    first, so the shuffle is bounded by the column's true cardinality
    per batch, not its row count; at 100 TB swap the exact path for the
    mergeable HLL registers `distinct_terms_hll` already demonstrates
    (documented trade, same output column)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from searchengine_ray.pipelines.common import bp as _bp

    stat_parts = []
    dist_parts = []
    for table, cols in _PROFILE_COLS:
        def make_partial(tname: str, cnames: list[str]):
            def partial(batch: pa.Table) -> pa.Table:
                out = {"col": [], "n_rows": [], "n_nulls": [],
                       "min_v": [], "max_v": []}
                for c in cnames:
                    arr = batch.column(c)
                    vals = arr.drop_null().to_numpy(zero_copy_only=False)
                    out["col"].append(f"{tname}.{c}")
                    out["n_rows"].append(batch.num_rows)
                    out["n_nulls"].append(arr.null_count)
                    # empty-batch guard: +-inf partials are identities
                    # for the min/max fold and can't win a real batch
                    out["min_v"].append(float(vals.min()) if len(vals)
                                        else float("inf"))
                    out["max_v"].append(float(vals.max()) if len(vals)
                                        else float("-inf"))
                return pa.table({"col": pa.array(out["col"], pa.string()),
                                 "n_rows": pa.array(out["n_rows"], pa.int64()),
                                 "n_nulls": pa.array(out["n_nulls"], pa.int64()),
                                 "min_v": pa.array(out["min_v"], pa.float64()),
                                 "max_v": pa.array(out["max_v"], pa.float64())})

            def distinct(batch: pa.Table) -> pa.Table:
                names, values = [], []
                for c in cnames:
                    vals = batch.column(c).drop_null().to_numpy(
                        zero_copy_only=False)
                    u = np.unique(vals)
                    names.extend([f"{tname}.{c}"] * len(u))
                    values.append(u.astype(np.float64))
                return pa.table({
                    "col": pa.array(names, pa.string()),
                    "value": pa.array(
                        np.concatenate(values) if values
                        else np.empty(0, np.float64), pa.float64())})

            return partial, distinct

        partial, distinct = make_partial(table, cols)
        ds = read(sf_dir, table, cols)
        stat_parts.append(ds.map_batches(partial, batch_format="pyarrow"))
        dist_parts.append(ds.map_batches(distinct, batch_format="pyarrow"))

    stats_ds = stat_parts[0]
    dist_ds = dist_parts[0]
    for s in stat_parts[1:]:
        stats_ds = stats_ds.union(s)
    for d in dist_parts[1:]:
        dist_ds = dist_ds.union(d)

    stats = (stats_ds.groupby("col")
             .aggregate(Sum("n_rows", alias_name="n_rows"),
                        Sum("n_nulls", alias_name="n_nulls"),
                        Min("min_v", alias_name="min_v"),
                        Max("max_v", alias_name="max_v"))
             .to_pandas())
    ndist = (dist_ds.groupby(["col", "value"])
             .aggregate(Count(alias_name="_n"))
             .groupby("col").aggregate(Count(alias_name="n_distinct"))
             .to_pandas())
    out = stats.merge(ndist, on="col").sort_values("col").reset_index(drop=True)
    return pa.table({
        "col": pa.array(out["col"], pa.string()),
        "n_rows": pa.array(out["n_rows"].to_numpy(np.int64), pa.int64()),
        "n_nulls": pa.array(out["n_nulls"].to_numpy(np.int64), pa.int64()),
        "n_distinct": pa.array(out["n_distinct"].to_numpy(np.int64), pa.int64()),
        "min_bp": pa.array(_bp(out["min_v"].to_numpy()), pa.int64()),
        "max_bp": pa.array(_bp(out["max_v"].to_numpy()), pa.int64())})


def table_profile_sql() -> str:
    selects = []
    for table, cols in _PROFILE_COLS:
        for c in cols:
            selects.append(f"""
SELECT '{table}.{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(floor(min({c}) * 10000 + 0.5) AS BIGINT) AS min_bp,
       CAST(floor(max({c}) * 10000 + 0.5) AS BIGINT) AS max_bp
FROM {table}""")
    return "\nUNION ALL\n".join(selects)
