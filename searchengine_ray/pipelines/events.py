"""Event-stream operators: session windows and as-of joins.

The reference engine is strictly batch (SURVEY §2.9: no windows or
watermarks), but the brief's custom-operator list names windowed
aggregates and as-of joins as first-class large-scale-pipeline needs.
Both are expressed as the composition Ray Data's API allows —
``map_batches`` (add a user-hash partition key) → ``groupby(upart)``
→ ``map_groups`` with a fully vectorized body — so the only shuffle is
ONE hash exchange on ``user_id % _N_UPARTS``.

Partitioning assumption (documented per the brief): all events of one
user fit in one group's memory. Users are the natural shard key for
event streams; a single user's history is bounded (and at 100 TB a
pathological user can be range-split by time inside the group body
before sorting, since sessionization only needs a gap-window overlap).

Hash-parity conventions follow ``common.py``: timestamps travel as
int64 epoch microseconds (pandas ``astype("datetime64[us]")`` ==
DuckDB ``epoch_us``), money as integer cents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from searchengine_ray.pipelines.common import cents, int64_col, read

_N_UPARTS = 32


def _add_upart(batch: pa.Table) -> pa.Table:
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "upart", pa.array((uid % _N_UPARTS).astype(np.int64)))


# ---- session windows (gaps-and-islands) ----


def _sessionize_part(gap_us: int):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy(dtype=np.int64)
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v_c = cents(df["value"].to_numpy())
        n = len(df)
        if n == 0:
            return pd.DataFrame({"user_id": [], "session_id": [],
                                 "n_events": [], "start_ts_us": [],
                                 "end_ts_us": [], "sum_value_c": []})
        # a row opens a new session iff it starts a new user or the gap
        # from the previous event of the same user exceeds gap_us
        new_s = np.ones(n, dtype=np.int64)
        same = uid[1:] == uid[:-1]
        within = (ts_us[1:] - ts_us[:-1]) <= gap_us
        new_s[1:] = (~(same & within)).astype(np.int64)
        gsid = np.cumsum(new_s)                     # globally unique per part
        ufirst = np.flatnonzero(np.r_[True, ~same])  # first row of each user
        ucounts = np.diff(np.r_[ufirst, n])
        base = np.repeat(gsid[ufirst] - 1, ucounts)
        sid = gsid - base                            # 1-based within user
        seg = np.flatnonzero(new_s)                  # session start rows
        counts = np.diff(np.r_[seg, n])
        return pd.DataFrame({
            "user_id": uid[seg],
            "session_id": sid[seg],
            "n_events": counts.astype(np.int64),
            "start_ts_us": ts_us[seg],
            "end_ts_us": ts_us[seg + counts - 1],
            "sum_value_c": np.add.reduceat(v_c, seg).astype(np.int64),
        })

    return body


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Per-user session windows: a new session opens after a silence
    longer than ``gap_minutes``. One hash shuffle on user_id; the
    gaps-and-islands scan is vectorized numpy inside each group."""
    gap_us = gap_minutes * 60 * 1_000_000
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    parts = ds.map_batches(_add_upart, batch_format="pyarrow")
    return parts.groupby("upart").map_groups(
        _sessionize_part(gap_us), batch_format="pandas")


def sessionize_events_sql(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sid AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS start_ts_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS end_ts_us,
       CAST(sum(v_c) AS BIGINT) AS sum_value_c
FROM sess GROUP BY user_id, sid
"""


# ---- as-of join ----


def _asof_part(left_type: str, right_type: str):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["event_type"] == left_type].sort_values(
            "ts", kind="mergesort")
        right = df[df["event_type"] == right_type].sort_values(
            "ts", kind="mergesort")
        cols = ["event_id", "user_id", "ts"]
        if left.empty or right.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                                 "user_id": pd.Series([], dtype=np.int64),
                                 "ts_us": pd.Series([], dtype=np.int64),
                                 "prior_event_id": pd.Series([], dtype=np.int64),
                                 "prior_ts_us": pd.Series([], dtype=np.int64)})
        right = right[cols].assign(prior_ts=right["ts"])  # merge_asof drops
        m = pd.merge_asof(left[cols], right, on="ts",     # the right 'on' col
                          by="user_id", direction="backward",
                          suffixes=("", "_r"))
        m = m.dropna(subset=["event_id_r"])          # inner, like ASOF JOIN
        return pd.DataFrame({
            "event_id": m["event_id"].to_numpy(dtype=np.int64),
            "user_id": m["user_id"].to_numpy(dtype=np.int64),
            "ts_us": m["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
            "prior_event_id": m["event_id_r"].to_numpy().astype(np.int64),
            "prior_ts_us": m["prior_ts"].astype("datetime64[us]").astype("int64").to_numpy(),
        })

    return body


def event_asof_join(sf_dir: str, left_type: str = "purchase",
                    right_type: str = "click"):
    """For every ``left_type`` event, the most recent same-user
    ``right_type`` event at-or-before it (ts >= prior ts). One hash
    shuffle on user_id; ``pd.merge_asof`` does the vectorized
    backward-search inside each group."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def keep_types(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column("event_type"),
                        value_set=pa.array([left_type, right_type]))
        return _add_upart(batch.filter(mask))

    parts = ds.map_batches(keep_types, batch_format="pyarrow")
    return parts.groupby("upart").map_groups(
        _asof_part(left_type, right_type), batch_format="pandas")


# ---- range (band) join ----


def _range_part(window_us: int):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        probes = df[df["kind"] == 1]
        ts = np.sort(df.loc[df["kind"] == 0, "ts_us"].to_numpy(dtype=np.int64))
        p_ts = probes["ts_us"].to_numpy(dtype=np.int64)
        # clicks of THIS bucket with ts in (p - window, p]; the probe's
        # other bucket-copy contributes the remainder of the window
        lo = np.searchsorted(ts, p_ts - window_us, side="right")
        hi = np.searchsorted(ts, p_ts, side="right")
        return pd.DataFrame({
            "event_id": probes["event_id"].to_numpy(dtype=np.int64),
            "n_recent_p": (hi - lo).astype(np.int64),
        })

    return body


def event_range_join(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click", window_minutes: int = 60):
    """Band join with NO equality key: for every ``left_type`` event,
    the number of ``right_type`` events (any user) in the half-open
    window ``(ts - window, ts]``.

    Scale shape: ONE hash shuffle on a time bucket whose width equals
    the window. Build rows land in exactly one bucket; each probe is
    duplicated into the two buckets its window can overlap, partial
    counts are summed by a tiny final groupby on event_id. Skew is
    bounded by events-per-window, not table size; a wider window at
    fixed data density only grows buckets linearly."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    window_us = window_minutes * 60 * 1_000_000
    ds = read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def to_bucketed(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        b = ts_us // window_us
        is_l = pc.equal(et, left_type).to_numpy(zero_copy_only=False)
        is_r = pc.equal(et, right_type).to_numpy(zero_copy_only=False)
        out_b = np.concatenate([b[is_r], b[is_l], b[is_l] - 1])
        out_ts = np.concatenate([ts_us[is_r], ts_us[is_l], ts_us[is_l]])
        out_id = np.concatenate([eid[is_r], eid[is_l], eid[is_l]])
        kind = np.concatenate([np.zeros(int(is_r.sum()), dtype=np.int64),
                               np.ones(2 * int(is_l.sum()), dtype=np.int64)])
        return pa.table({"bucket": int64_col(out_b), "ts_us": int64_col(out_ts),
                         "event_id": int64_col(out_id), "kind": int64_col(kind)})

    parts = ds.map_batches(to_bucketed, batch_format="pyarrow")
    partial = parts.groupby("bucket").map_groups(
        _range_part(window_us), batch_format="pandas")
    return partial.groupby("event_id").aggregate(
        Sum("n_recent_p", alias_name="n_recent"))


def event_range_join_sql(left_type: str = "purchase",
                         right_type: str = "click",
                         window_minutes: int = 60) -> str:
    window_us = window_minutes * 60 * 1_000_000
    return f"""
SELECT CAST(l.event_id AS BIGINT) AS event_id,
       CAST(count(r.event_id) AS BIGINT) AS n_recent
FROM (SELECT event_id, epoch_us(ts) AS t FROM events
      WHERE event_type = '{left_type}') l
LEFT JOIN (SELECT event_id, epoch_us(ts) AS t FROM events
           WHERE event_type = '{right_type}') r
  ON r.t > l.t - {window_us} AND r.t <= l.t
GROUP BY l.event_id
"""


def event_asof_join_sql(left_type: str = "purchase",
                        right_type: str = "click") -> str:
    return f"""
SELECT CAST(l.event_id AS BIGINT) AS event_id,
       CAST(l.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
       CAST(r.event_id AS BIGINT) AS prior_event_id,
       CAST(epoch_us(r.ts) AS BIGINT) AS prior_ts_us
FROM (SELECT * FROM events WHERE event_type = '{left_type}') l
ASOF JOIN (SELECT * FROM events WHERE event_type = '{right_type}') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---- grouped exact quantiles (distributed selection per key) ----


def _quantile_group(qs: tuple[float, ...]):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["value"].to_numpy(np.float64))
        n = len(v)
        # quantile_disc rule: the element at ceil(q*n)-1 — an ACTUAL
        # member of the group, so the result is bit-exact (no float
        # interpolation to drift from the oracle)
        picks = [v[min(int(np.ceil(q * n)) - 1, n - 1)] for q in qs]
        out = {"event_type": [df["event_type"].iloc[0]],
               "n": np.array([n], dtype=np.int64)}
        for q, p in zip(qs, picks):
            out[f"p{int(q * 100)}_cents"] = cents(np.array([p]))
        return pd.DataFrame(out)

    body.__name__ = "quantile_group"
    return body


def event_value_quantiles(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """(event_type, n, p50/p90/p99 cents) — exact discrete quantiles of
    ``value`` per event type.

    Shape: ONE hash shuffle on the group key, then an in-group sort +
    select. Partitioning assumption (same class as the session/as-of
    ops): one key's values fit one worker — event-type keys are
    low-cardinality but each group is value-only (8 B/row). At 100 TB,
    swap the body for the two-pass histogram-refine selection (partial
    per-batch histograms -> candidate range -> exact pass) — the
    group-key shuffle and output contract stay identical.
    """
    ds = read(sf_dir, "events", ["event_type", "value"])
    return ds.groupby("event_type").map_groups(_quantile_group(qs),
                                               batch_format="pandas")


def event_value_quantiles_sql(qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    picks = ",\n       ".join(
        f"CAST(floor(quantile_disc(value, {q}) * 100 + 0.5) AS BIGINT)"
        f" AS p{int(q * 100)}_cents" for q in qs)
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {picks}
FROM events GROUP BY event_type
"""


# ---- hopping (overlapping) window aggregate ----


def hopping_window_counts(sf_dir: str, window_minutes: int = 60,
                          hop_minutes: int = 15):
    """(window_start_us, event_type, n_events, sum_value_cents) — counts
    per OVERLAPPING time window (length ``window``, stride ``hop``).

    The streaming hopping-window analog in batch form: each event maps
    into exactly ``window/hop`` windows — a bounded per-row fan-out
    inside ``map_batches`` (duplication factor 4 here, never data-
    dependent) — then one pre-aggregated groupby on (window, type).
    The shuffle carries per-batch partials, not duplicated events.
    """
    from ray.data.aggregate import Sum

    window_us = window_minutes * 60 * 1_000_000
    hop_us = hop_minutes * 60 * 1_000_000
    k = window_us // hop_us

    def expand(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        vc = cents(val)
        types = batch.column("event_type")
        base = (t // hop_us) * hop_us
        frames = []
        for i in range(k):
            ws = base - i * hop_us
            frames.append(pd.DataFrame({
                "window_start_us": ws, "event_type": types.to_pandas(),
                "n_p": 1, "sum_p": vc}))
        df = pd.concat(frames)
        g = df.groupby(["window_start_us", "event_type"], as_index=False).agg(
            n_p=("n_p", "sum"), sum_p=("sum_p", "sum"))
        return pa.table({"window_start_us": int64_col(g["window_start_us"]),
                         "event_type": pa.array(g["event_type"], pa.string()),
                         "n_p": int64_col(g["n_p"]),
                         "sum_p": int64_col(g["sum_p"])})

    ds = read(sf_dir, "events", ["ts", "event_type", "value"])
    partial = ds.map_batches(expand, batch_format="pyarrow", batch_size=65536)
    out = partial.groupby(["window_start_us", "event_type"]).aggregate(
        Sum("n_p", alias_name="n_events"),
        Sum("sum_p", alias_name="sum_value_cents"))
    return out


def hopping_window_counts_sql(window_minutes: int = 60,
                              hop_minutes: int = 15) -> str:
    window_us = window_minutes * 60 * 1_000_000
    hop_us = hop_minutes * 60 * 1_000_000
    k = window_us // hop_us
    return f"""
WITH e AS (
  SELECT epoch_us(ts) AS t, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events),
-- exact FLOOR division (numpy // semantics): DuckDB's integer //
-- truncates toward zero, which disagrees for pre-epoch timestamps;
-- subtracting the non-negative remainder first makes // exact+floored
f AS (
  SELECT (t - ((t % {hop_us}) + {hop_us}) % {hop_us}) // {hop_us} AS fd,
         event_type, vc
  FROM e),
x AS (
  SELECT (fd - i) * {hop_us} AS window_start_us, event_type, vc
  FROM f, unnest(generate_series(0, {k - 1})) AS u(i))
SELECT window_start_us, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vc) AS BIGINT) AS sum_value_cents
FROM x GROUP BY window_start_us, event_type
"""


# ---- semi-structured props extraction ----


def _props_extract_partial(batch: pa.Table) -> pa.Table:
    """Vectorized JSON-field extraction + per-batch pre-aggregation:
    pull the integer ``k`` field out of the ``props`` JSON string with
    one C-kernel regex (no per-row json.loads loop — the schema-on-read
    path a 100-TB event log needs), then collapse the batch to one row
    per (event_type, parse outcome) so the shuffle carries partials,
    never events."""
    et = pd.Series(batch.column("event_type").to_pylist())
    props = pd.Series(batch.column("props").to_pylist())
    k = props.str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
    ok = k.notna()
    kv = pd.to_numeric(k, errors="coerce").fillna(0).astype(np.int64)
    g = (pd.DataFrame({"event_type": et, "ok": ok.astype(np.int64),
                       "k": kv.where(ok, 0), "k2": (kv * kv).where(ok, 0)})
         .groupby("event_type", as_index=False)
         .agg(n_events=("ok", "size"), n_with_k=("ok", "sum"),
              sum_k=("k", "sum"), sum_k2=("k2", "sum")))
    return pa.table({
        "event_type": pa.array(g["event_type"].tolist(), pa.string()),
        "n_events": int64_col(g["n_events"].to_numpy()),
        "n_with_k": int64_col(g["n_with_k"].to_numpy()),
        "sum_k": int64_col(g["sum_k"].to_numpy()),
        "sum_k2": int64_col(g["sum_k2"].to_numpy())})


def _props_finalize(batch: pa.Table) -> pa.Table:
    from searchengine_ray.pipelines.common import bp

    nk = batch.column("n_with_k").to_numpy(zero_copy_only=False).astype(np.float64)
    sk = batch.column("sum_k").to_numpy(zero_copy_only=False).astype(np.float64)
    avg = bp(sk / np.maximum(nk, 1.0))
    return batch.append_column("avg_k_bp", int64_col(avg))


def event_props_stats(sf_dir: str):
    """(event_type, n_events, n_with_k, sum_k, sum_k2, avg_k_bp) —
    schema-on-read aggregation over the semi-structured ``props`` JSON
    column: extract the integer ``k`` per event, aggregate exact integer
    sums (+ sum of squares, for a downstream variance) per event_type.

    Shape: per-batch vectorized extract + pre-aggregation, then a tiny
    groupby over (event_type, batches) partial rows — the wide shuffle
    never sees event-level rows. The regex extraction is the contract
    on BOTH sides (SQL replays the same pattern), so malformed props
    degrade identically: unparsable rows count in n_events only."""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "events", ["event_type", "props"]).map_batches(
        _props_extract_partial, batch_format="pyarrow", batch_size=65536)
    out = partial.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_with_k", alias_name="n_with_k"),
        Sum("sum_k", alias_name="sum_k"),
        Sum("sum_k2", alias_name="sum_k2"))
    return out.map_batches(_props_finalize, batch_format="pyarrow")


def event_props_stats_sql() -> str:
    return """
WITH x AS (
  SELECT event_type,
         regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS ks
  FROM events),
t AS (
  SELECT event_type,
         CASE WHEN ks <> '' THEN 1 ELSE 0 END AS ok,
         CASE WHEN ks <> '' THEN CAST(ks AS BIGINT) ELSE 0 END AS k
  FROM x),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(ok) AS BIGINT) AS n_with_k,
         CAST(sum(k) AS BIGINT) AS sum_k,
         CAST(sum(k * k) AS BIGINT) AS sum_k2
  FROM t GROUP BY event_type)
SELECT event_type, n_events, n_with_k, sum_k, sum_k2,
       CAST(floor(CAST(sum_k AS DOUBLE) / greatest(n_with_k, 1) * 10000 + 0.5)
            AS BIGINT) AS avg_k_bp
FROM agg
"""


# ---- one-pass histogram quantiles (mergeable sketch) ----


class _ValueHistPartial:
    """map_batches: (event_type, bin_cents, n_p) partial histogram
    rows — each batch contributes at most (types x distinct cent bins)
    tiny int64 rows, mergeable by a plain Sum. This is the one-pass
    quantile summary the exact op's docstring promises for 100 TB:
    no per-key value sort, no value-only groups on one worker."""

    __name__ = "value_hist_partial"

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "bin_cents": cents(batch.column("value").to_numpy(
                zero_copy_only=False))})
        g = df.groupby(["event_type", "bin_cents"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            "event_type": pa.array(idx["event_type"].tolist(), pa.string()),
            "bin_cents": int64_col(idx["bin_cents"].to_numpy(np.int64)),
            "n_p": int64_col(g.to_numpy(np.int64))})


def _hist_quantile_group(qs: tuple[float, ...]):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bin_cents")
        n_col = df["n"].to_numpy(np.int64)
        cum = np.cumsum(n_col)
        total = int(cum[-1])
        bins = df["bin_cents"].to_numpy(np.int64)
        out = {"event_type": [df["event_type"].iloc[0]],
               "n": np.array([total], dtype=np.int64)}
        for q in qs:
            k = min(int(np.ceil(q * total)), total)
            out[f"p{int(q * 100)}_cents"] = np.array(
                [bins[np.searchsorted(cum, k)]], dtype=np.int64)
        return pd.DataFrame(out)

    body.__name__ = "hist_quantile_group"
    return body


def value_quantiles_histogram(sf_dir: str,
                              qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """(event_type, n, p50/p90/p99 cents) — discrete quantiles of
    ``value`` per event type via a ONE-PASS mergeable cent-bin
    histogram (the 100-TB path ``event_value_quantiles``' docstring
    points to): per-batch partial counts -> one (type, bin) groupby of
    int64 partials -> a per-type selection over its bin rows.

    Because cents-rounding is monotone non-decreasing, the k-th order
    statistic of rounded values IS the rounded k-th order statistic —
    so this returns EXACTLY the exact op's output (asserted in tests),
    while the shuffle carries bounded histogram rows instead of every
    value and nothing ever sorts a corpus-scale group."""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "events", ["event_type", "value"]).map_batches(
        _ValueHistPartial, batch_format="pyarrow", batch_size=65536,
        concurrency=(1, 4))
    summed = partial.groupby(["event_type", "bin_cents"]).aggregate(
        Sum("n_p", alias_name="n"))
    return summed.groupby("event_type").map_groups(
        _hist_quantile_group(qs), batch_format="pandas")


def value_quantiles_histogram_sql(
        qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    picks = ",\n       ".join(
        f"(SELECT min(bin_cents) FROM cum"
        f" WHERE cum.event_type = t.event_type"
        f" AND cum.cum >= CAST(ceil({q} * t.n) AS BIGINT))"
        f" AS p{int(q * 100)}_cents" for q in qs)
    return f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS bin_cents
  FROM events),
c AS (
  SELECT event_type, bin_cents, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY event_type, bin_cents),
cum AS (
  SELECT event_type, bin_cents,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin_cents)
              AS BIGINT) AS cum
  FROM c),
t AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n
  FROM c GROUP BY event_type)
SELECT t.event_type, t.n,
       {picks}
FROM t
"""


# ---- per-window distinct-user HyperLogLog sketches -------------------

_WHLL_P = 10                       # 1024 registers -> ~3.25% std error
_WHLL_Q = 50
_WHLL_DAY_US = 86_400_000_000


class _WindowUserHLLPartial:
    """batch -> per-(window, register) partial rank maxima over the
    batch's distinct (window, user) pairs — the keyed-sketch layout:
    the shuffle carries at most windows x 2^p tiny integer rows per
    batch regardless of event volume, and register maxima merge
    exactly in any order. md5 low-64 of the user id's decimal string
    == DuckDB md5_number_lower(CAST(user_id AS VARCHAR)), so the
    construction is SQL-replayable bit-for-bit."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        t = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        win = (t // _WHLL_DAY_US) * _WHLL_DAY_US
        df = pd.DataFrame({"win": win, "uid": uid}).drop_duplicates()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:16],
                            "little") for u in df["uid"]),
            dtype=np.uint64, count=len(df))
        idx = (h >> np.uint64(64 - _WHLL_P)).astype(np.int64)
        w = (h & np.uint64((1 << _WHLL_Q) - 1)).astype(np.float64)
        exp = np.frexp(np.maximum(w, 1))[1]      # integer-exact bit length
        rank = np.where(w > 0, _WHLL_Q + 1 - exp,
                        _WHLL_Q + 1).astype(np.int64)
        g = pd.DataFrame({"window_start_us": df["win"].to_numpy(np.int64),
                          "register": idx, "rank_p": rank}) \
            .groupby(["window_start_us", "register"], as_index=False).max()
        return pa.table({
            "window_start_us": int64_col(g["window_start_us"]),
            "register": int64_col(g["register"]),
            "rank_p": int64_col(g["rank_p"])})


def window_user_hll(sf_dir: str):
    """(window_start_us, register, rank) — nonzero HyperLogLog
    registers of the DISTINCT-USER sketch per tumbling day window: the
    streaming daily-active-users counter in mergeable-sketch form
    (composes the sketch family with the window family). Registers are
    integer maxima, so the groupby is exact on any partitioning and
    the whole construction hash-verifies against the md5 SQL replay;
    the float estimate is a pure function of these rows (bound-checked
    by ``window_user_hll_violations``)."""
    from ray.data.aggregate import Max

    ds = read(sf_dir, "events", ["ts", "user_id"])
    partial = ds.map_batches(_WindowUserHLLPartial, batch_format="pyarrow",
                             batch_size=65536, concurrency=(1, 4))
    return partial.groupby(["window_start_us", "register"]).aggregate(
        Max("rank_p", alias_name="rank"))


def window_user_hll_sql() -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT (epoch_us(ts) // {_WHLL_DAY_US}) * {_WHLL_DAY_US}
           AS window_start_us,
         user_id
  FROM events),
h AS (
  SELECT window_start_us,
         CAST(md5_number_lower(CAST(user_id AS VARCHAR)) AS UHUGEINT) AS hv
  FROM e),
parts AS (
  SELECT window_start_us,
         CAST(hv // {1 << (64 - _WHLL_P)}::UHUGEINT AS BIGINT) AS register,
         CAST(hv % {1 << _WHLL_Q}::UHUGEINT AS BIGINT) AS w
  FROM h)
SELECT window_start_us, register,
       CAST(max(CASE WHEN w = 0 THEN {_WHLL_Q + 1}
                     ELSE {_WHLL_Q + 1} - length(printf('%b', w)) END)
            AS BIGINT) AS rank
FROM parts GROUP BY window_start_us, register
"""


def window_user_hll_violations(sf_dir: str):
    """Windows where the HLL estimate misses the EXACT distinct-user
    count by more than the 3-sigma relative bound (plus small-count
    slack) — expected empty; any row hash-mismatches the empty-set
    oracle and fails the gate. The exact side is a pre-aggregated
    distinct count (verification-scale); the estimate derives from the
    same register rows the hash-verified op emits."""
    from ray.data.aggregate import Sum

    from searchengine_ray.pipelines.textstats import _hll_estimate

    regs = window_user_hll(sf_dir)

    def est_group(df: pd.DataFrame) -> pa.Table:
        arr = np.zeros(1 << _WHLL_P, dtype=np.uint8)
        arr[df["register"].to_numpy(np.int64)] = \
            df["rank"].to_numpy(np.int64).astype(np.uint8)
        return pa.table({
            "window_start_us": int64_col(df["window_start_us"].iloc[:1]
                                         .to_numpy(np.int64)),
            "src": int64_col(np.zeros(1, np.int64)),
            "val": int64_col(np.array([int(round(_hll_estimate(arr)))],
                                      np.int64))})

    ests = regs.groupby("window_start_us").map_groups(
        est_group, batch_format="pandas")

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        win = (t // _WHLL_DAY_US) * _WHLL_DAY_US
        df = pd.DataFrame({"window_start_us": win, "user_id": uid}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = read(sf_dir, "events", ["ts", "user_id"]).map_batches(
        dedup_pairs, batch_format="pyarrow", batch_size=65536)
    exact = pairs.groupby(["window_start_us", "user_id"]).count() \
        .map_batches(lambda b: pa.table({
            "window_start_us": b.column("window_start_us"),
            "src": pa.array(np.ones(len(b), np.int64), pa.int64()),
            "val": pa.array(np.ones(len(b), np.int64), pa.int64())}),
            batch_format="pyarrow") \
        .groupby(["window_start_us", "src"]).aggregate(
            Sum("val", alias_name="val"))

    def check(df: pd.DataFrame) -> pa.Table:
        est = int(df.loc[df["src"] == 0, "val"].iloc[0])
        true = int(df.loc[df["src"] == 1, "val"].iloc[0])
        bound = max(0.10 * true, 3.0)       # 3 sigma at m=1024, + slack
        if abs(est - true) <= bound:
            return pa.table({"window_start_us": pa.array([], pa.int64()),
                             "n_exact": pa.array([], pa.int64()),
                             "n_est": pa.array([], pa.int64())})
        w = int(df["window_start_us"].iloc[0])
        return pa.table({"window_start_us": int64_col([w]),
                         "n_exact": int64_col([true]),
                         "n_est": int64_col([est])})

    out = ests.union(exact).groupby("window_start_us").map_groups(
        check, batch_format="pandas")
    # materialize with an EXPLICIT schema: the expected result is empty
    # and an all-empty Dataset loses its column types on to_pandas
    # (the top_terms_sketch_violations precedent); take_all is bounded
    # by the violation count — 0 when the sketch is correct
    rows = out.take_all()
    return pa.table({
        "window_start_us": int64_col(np.array(
            [r["window_start_us"] for r in rows], np.int64)),
        "n_exact": int64_col(np.array([r["n_exact"] for r in rows],
                                      np.int64)),
        "n_est": int64_col(np.array([r["n_est"] for r in rows],
                                    np.int64))})


def window_user_hll_violations_sql() -> str:
    """The bound holds for any input and partitioning: empty set."""
    return """
SELECT CAST(NULL AS BIGINT) AS window_start_us,
       CAST(NULL AS BIGINT) AS n_exact, CAST(NULL AS BIGINT) AS n_est
WHERE FALSE
"""


# ---- funnel analysis (ordered step conversion) ----

_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_MIN = 4320      # 3-day conversion window from first
# touch — chosen so every step converts a strict nonzero subset on the
# synthetic event stream (15/10/5 at sf0.001), keeping all three join
# paths exercised by the oracle gate


def _funnel_part(steps: tuple[str, str, str], window_us: int):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        d = pd.DataFrame({"user_id": df["user_id"].astype(np.int64),
                          "et": df["event_type"], "ts": ts_us})
        s1 = d.loc[d["et"] == steps[0]].groupby("user_id")["ts"].min()
        e2 = d.loc[d["et"] == steps[1]].copy()
        e2["t1"] = e2["user_id"].map(s1)
        e2 = e2[(e2["ts"] > e2["t1"]) & (e2["ts"] - e2["t1"] <= window_us)]
        s2 = e2.groupby("user_id")["ts"].min()
        e3 = d.loc[d["et"] == steps[2]].copy()
        e3["t1"] = e3["user_id"].map(s1)
        e3["t2"] = e3["user_id"].map(s2)
        e3 = e3[(e3["ts"] > e3["t2"]) & (e3["ts"] - e3["t1"] <= window_us)]
        s3 = e3.groupby("user_id")["ts"].min()
        return pd.DataFrame({
            "step": np.array([1, 2, 3], np.int64),
            "event_type": list(steps),
            "n_p": np.array([len(s1), len(s2), len(s3)], np.int64)})

    return body


def event_funnel(sf_dir: str, steps: tuple[str, str, str] = _FUNNEL_STEPS,
                 window_minutes: int = _FUNNEL_WINDOW_MIN):
    """(step, event_type, n_users) — first-touch funnel conversion:
    users whose first ``steps[0]`` is followed STRICTLY later by a
    ``steps[1]``, then that by a ``steps[2]``, every later step within
    ``window_minutes`` of the first touch. The product-analytics
    ordered-sequence operator (each step's count is the classic funnel
    bar; consecutive ratios are the drop-offs).

    Same shape as sessionize: ONE hash shuffle on user_id co-locates
    each user's history, the per-group body is all pandas C kernels
    (per-user first-touch mins + NaN-propagating map joins — no Python
    row loop), and each group emits a 3-row partial that one tiny
    groupby sums. Column pruning drops value/props at the read."""
    from ray.data.aggregate import Sum

    window_us = window_minutes * 60 * 1_000_000
    ds = read(sf_dir, "events", ["user_id", "ts", "event_type"])
    parts = ds.map_batches(_add_upart, batch_format="pyarrow")
    return parts.groupby("upart").map_groups(
        _funnel_part(steps, window_us), batch_format="pandas") \
        .groupby(["step", "event_type"]) \
        .aggregate(Sum("n_p", alias_name="n_users"))


def event_funnel_sql(steps: tuple[str, str, str] = _FUNNEL_STEPS,
                     window_minutes: int = _FUNNEL_WINDOW_MIN) -> str:
    w_us = window_minutes * 60 * 1_000_000
    s1, s2, s3 = steps
    return f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = '{s1}' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = '{s2}' AND e.ts > t1.t1
    AND epoch_us(e.ts) - epoch_us(t1.t1) <= {w_us}
  GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id) JOIN t1 USING (user_id)
  WHERE e.event_type = '{s3}' AND e.ts > t2.t2
    AND epoch_us(e.ts) - epoch_us(t1.t1) <= {w_us}
  GROUP BY e.user_id)
SELECT 1 AS step, '{s1}' AS event_type,
       CAST(count(*) AS BIGINT) AS n_users FROM t1
UNION ALL
SELECT 2, '{s2}', CAST(count(*) AS BIGINT) FROM t2
UNION ALL
SELECT 3, '{s3}', CAST(count(*) AS BIGINT) FROM t3
"""


# ---- cohort retention ----

_DAY_US = 86400 * 1_000_000


def _retention_part(df: pd.DataFrame) -> pd.DataFrame:
    ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    uid = df["user_id"].to_numpy(np.int64)
    w = ts_us // _DAY_US
    d = pd.DataFrame({"user_id": uid, "w": w})
    cw = d.groupby("user_id")["w"].min()
    pairs = d.drop_duplicates()
    off = pairs["w"].to_numpy() - pairs["user_id"].map(cw).to_numpy()
    out = pd.DataFrame({"cohort_day": pairs["user_id"].map(cw).to_numpy(),
                        "day_offset": off}) \
        .groupby(["cohort_day", "day_offset"], as_index=False).size()
    return pd.DataFrame({
        "cohort_day": out["cohort_day"].to_numpy(np.int64),
        "day_offset": out["day_offset"].to_numpy(np.int64),
        "n_p": out["size"].to_numpy(np.int64)})


def user_retention(sf_dir: str):
    """(cohort_day, day_offset, n_users) — daily cohort retention:
    users are cohorted by the epoch-day of their FIRST event
    (epoch_us // one-day-in-µs, the exact integer convention shared
    with the oracle), and n_users counts the cohort's distinct users
    active again day_offset days later (offset 0 = cohort size).
    The companion read-out to event_funnel: funnels measure ordered
    conversion, retention measures coming back.

    One user_id hash shuffle (a user's whole history co-locates, so
    per-group distinct users ARE globally distinct); per-group body is
    a groupby-min + drop_duplicates in pandas C kernels; each group
    emits (cohort, offset, n_p) partials — at most n_days² rows —
    that one tiny groupby sums."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["user_id", "ts"])
    parts = ds.map_batches(_add_upart, batch_format="pyarrow")
    return parts.groupby("upart").map_groups(
        _retention_part, batch_format="pandas") \
        .groupby(["cohort_day", "day_offset"]) \
        .aggregate(Sum("n_p", alias_name="n_users"))


def user_retention_sql() -> str:
    return f"""
WITH f AS (
  SELECT user_id, min(epoch_us(ts)) // {_DAY_US} AS cw
  FROM events GROUP BY user_id),
a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS w
  FROM events)
SELECT CAST(f.cw AS BIGINT) AS cohort_day,
       CAST(a.w - f.cw AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY f.cw, a.w - f.cw
"""


# ---- event-rate anomaly flags (all-integer z-test) ----

_ANOM_K = 2          # flag days beyond k sample standard deviations


class _TypeDayPartial:
    """batch -> (event_type, day, c_p) partial counts — bounded at
    n_types x n_days rows per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_pandas().astype("datetime64[us]") \
            .astype("int64").to_numpy()
        day = ts // _DAY_US
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        tcodes, tvals = pd.factorize(et)
        dcodes, dvals = pd.factorize(day)
        key = tcodes.astype(np.int64) * len(dvals) + dcodes
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": pa.array(tvals[(uk // len(dvals))].tolist(),
                                   pa.string()),
            "day": int64_col(dvals[(uk % len(dvals))]),
            "c_p": int64_col(cnt.astype(np.int64))})


def _anomaly_group(k: int):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        c = df["count"].to_numpy(np.int64)
        n = len(c)
        s = int(c.sum())
        q = int((c * c).sum())
        dev_n = n * c - s                   # n·(c_d − mean), exact
        # |c_d − mean| > k·σ  ⟺  (n·c_d − S)² > k²·n·(nQ − S²)/n
        #                     ⟺  dev_n² · 1 > k² · (nQ − S²)   [×n²/n]
        thr = k * k * (n * q - s * s)       # n²·k²·σ², exact
        flag = dev_n * dev_n > thr
        return pd.DataFrame({
            "event_type": df["event_type"],
            "day": df["day"].to_numpy(np.int64),
            "count": c,
            "dev_n": dev_n,
            "is_anomaly": flag})

    body.__name__ = "anomaly_group"
    return body


def event_rate_anomaly(sf_dir: str, k: int = _ANOM_K):
    """(event_type, day, count, dev_n, is_anomaly) — daily event-rate
    anomaly detection: a (type, day) cell is anomalous when its count
    deviates from the type's own daily mean by more than k sample
    standard deviations. The pipeline-health monitor every ingestion
    stack runs (a collapsed or doubled feed shows up as a flagged day).

    ALL-integer math: the z-test |c−µ| > kσ is evaluated as
    (n·c − S)² > k²·(nQ − S²) over exact integer sums S=Σc, Q=Σc² —
    no float, no sqrt, so engine and oracle agree bit-for-bit by
    construction (dev_n = n·c − S is emitted for inspection). Shape:
    per-batch (type, day) partials -> ONE groupby sum (cells are
    types × days, corpus-size-independent per unit time) -> per-type
    map_groups over day rows (bounded groups)."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["ts", "event_type"])
    cells = ds.map_batches(_TypeDayPartial, batch_format="pyarrow",
                           concurrency=(1, 4)) \
        .groupby(["event_type", "day"]) \
        .aggregate(Sum("c_p", alias_name="count"))
    return cells.groupby("event_type").map_groups(
        _anomaly_group(k), batch_format="pandas")


def event_rate_anomaly_sql(k: int = _ANOM_K) -> str:
    return f"""
WITH cells AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(count(*) AS BIGINT) AS count
  FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(count) AS BIGINT) AS s,
         CAST(sum(count * count) AS BIGINT) AS q
  FROM cells GROUP BY event_type)
SELECT c.event_type, CAST(c.day AS BIGINT) AS day, c.count,
       CAST(st.n * c.count - st.s AS BIGINT) AS dev_n,
       (st.n * c.count - st.s) * (st.n * c.count - st.s)
         > {k * k} * (st.n * st.q - st.s * st.s) AS is_anomaly
FROM cells c JOIN stats st USING (event_type)
"""


# ---- event-type transition matrix (behavioral Markov counts) ----


def _transitions_part(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    uid = df["user_id"].to_numpy(np.int64)
    et = df["event_type"].to_numpy()
    same = uid[1:] == uid[:-1]
    src = et[:-1][same]
    dst = et[1:][same]
    scodes, svals = pd.factorize(src)
    dcodes, dvals = pd.factorize(dst)
    key = scodes.astype(np.int64) * max(len(dvals), 1) + dcodes
    uk, cnt = np.unique(key, return_counts=True)
    return pd.DataFrame({
        "from_type": svals[(uk // max(len(dvals), 1))],
        "to_type": dvals[(uk % max(len(dvals), 1))],
        "n_p": cnt.astype(np.int64)})


def event_transitions(sf_dir: str):
    """(from_type, to_type, n) — the first-order Markov transition
    counts of consecutive same-user events ordered by (ts, event_id):
    the behavioral-flow matrix behind funnel design ("what actually
    follows a view?") and session modeling. Same one-user-shuffle
    shape as sessionize; the per-group body is one mergesort +
    factorized pair counting, each group emitting at most
    n_types² partial rows that one tiny groupby sums."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    parts = ds.map_batches(_add_upart, batch_format="pyarrow")
    return parts.groupby("upart").map_groups(
        _transitions_part, batch_format="pandas") \
        .groupby(["from_type", "to_type"]) \
        .aggregate(Sum("n_p", alias_name="n"))


def event_transitions_sql() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


# ---- pivot: long -> wide daily type counts ----

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def event_pivot(sf_dir: str):
    """(day, n_click, n_error, n_purchase, n_signup, n_view) — the
    long→wide PIVOT operator: one row per day, one count column per
    event type. The column set is the pipeline's declared type
    vocabulary (``_PIVOT_TYPES``) — fixed up front like any schema, so
    the wide schema is stable regardless of which types a given day
    (or corpus slice) happens to contain; unknown types count nowhere.

    Scale shape: each batch pivots locally (vectorized bincount over
    day×type codes) into ONE wide partial row per day, so the single
    day-keyed groupby carries days×types integers, never events."""
    from ray.data.aggregate import Sum

    tmap = {t: i for i, t in enumerate(_PIVOT_TYPES)}
    T = len(_PIVOT_TYPES)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day = df["ts"].dt.strftime("%Y-%m-%d").to_numpy()
        code = df["event_type"].map(tmap).fillna(-1).to_numpy(np.int64)
        keep = code >= 0
        day, code = day[keep], code[keep]
        udays, dinv = np.unique(day, return_inverse=True)
        counts = np.bincount(dinv * T + code,
                             minlength=len(udays) * T).reshape(-1, T)
        cols = {"day": pa.array(udays, pa.string())}
        for i, t in enumerate(_PIVOT_TYPES):
            cols[f"n_{t}"] = int64_col(counts[:, i].astype(np.int64))
        return pa.table(cols)

    ds = read(sf_dir, "events", ["ts", "event_type"])
    wide = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in _PIVOT_TYPES]
    out = wide.groupby("day").aggregate(*aggs)

    def cast(batch: pa.Table) -> pa.Table:
        cols = {"day": batch.column("day")}
        for t in _PIVOT_TYPES:
            cols[f"n_{t}"] = batch.column(f"n_{t}").cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(cast, batch_format="pyarrow")


def event_pivot_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        f" AS n_{t}" for t in _PIVOT_TYPES)
    return f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       {cols}
FROM events GROUP BY strftime(ts, '%Y-%m-%d')
"""


# ---- window frame: per-user running value total ----


def user_running_total(sf_dir: str):
    """(event_id, user_id, cum_value_c) — each event's cumulative value
    total within its user's history ordered by (ts, event_id): the
    window-frame class (SUM OVER ... ROWS UNBOUNDED PRECEDING) beside
    the gaps-and-islands (sessionize) and ranking classes. Exact
    integer cents.

    Scale shape: the sessionize shape — ONE ``user_id % 32`` co-group
    shuffle, then a fully vectorized per-group body (lexsort + global
    cumsum with per-user offsets subtracted, no per-user loop). Same
    one-user-fits-one-group assumption, same range-split escape hatch
    (events.py module docstring)."""
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "g": int64_col(batch.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64) % 32),
            "event_id": batch.column("event_id").cast(pa.int64()),
            "user_id": batch.column("user_id").cast(pa.int64()),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "v_c": int64_col(cents(batch.column("value").to_numpy(
                zero_copy_only=False)))})

    def body(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        v = df["v_c"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, eid, v = u[order], ts[order], eid[order], v[order]
        cum = np.cumsum(v)
        # subtract each user's prefix (global cumsum just before the
        # user's first row), mapped back via the run id — no per-user loop
        is_first = np.r_[True, u[1:] != u[:-1]]
        run_id = np.cumsum(is_first) - 1
        first_idx = np.flatnonzero(is_first)
        run_offset = cum[first_idx] - v[first_idx]
        cum_user = cum - run_offset[run_id]
        return pd.DataFrame({"event_id": eid, "user_id": u,
                             "cum_value_c": cum_user})

    return ds.map_batches(keyed, batch_format="pyarrow", batch_size=65536) \
        .groupby("g").map_groups(body, batch_format="pandas")


def user_running_total_sql() -> str:
    return """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_c
FROM events
"""


# ---- grouped model fit: per-type daily-count trend ----

_DAY_US = 86_400_000_000


def event_trend(sf_dir: str):
    """(event_type, n_days, slope_bp) — per-type least-squares slope of
    daily event counts over integer day indexes (counts/day in bp): the
    grouped-model-fit operator class (is each event stream growing or
    decaying?). Days with zero events for a type are absent from that
    type's fit — same on both sides by construction. All-integer
    arithmetic end to end with TRUNCATING division mirroring DuckDB's
    ``//`` (the zipf_slope lesson — the slope CAN be negative).

    Scale shape: per-batch (type, day) partial counts → one tiny
    groupby (types × days rows) → a per-type vectorized fold. Raw
    events cross the exchange as pre-aggregated partials only."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = ts // _DAY_US
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        import pandas as pd

        g = pd.DataFrame({"event_type": types, "day": day}).groupby(
            ["event_type", "day"], as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"].astype(str)),
            "day": int64_col(g["day"].to_numpy(np.int64)),
            "n_p": int64_col(g["size"].to_numpy(np.int64))})

    daily = read(sf_dir, "events", ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby(["event_type", "day"]).aggregate(Sum("n_p", alias_name="n"))

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        x = df["day"].to_numpy(np.int64)
        y = df["n"].to_numpy(np.int64)
        nd = len(x)
        num = nd * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = nd * int((x * x).sum()) - int(x.sum()) ** 2
        if den == 0:
            slope = 0
        else:
            scaled = num * 10000
            slope = abs(scaled) // den * (1 if scaled >= 0 else -1)
        return pd.DataFrame({"event_type": [df["event_type"].iloc[0]],
                             "n_days": np.array([nd], np.int64),
                             "slope_bp": np.array([slope], np.int64)})

    return daily.groupby("event_type").map_groups(fit, batch_format="pandas")


def event_trend_sql() -> str:
    return f"""
WITH d AS (
  SELECT event_type, CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(day) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sy,
         CAST(sum(day * n) AS BIGINT) AS sxy,
         CAST(sum(day * day) AS BIGINT) AS sxx
  FROM d GROUP BY event_type)
SELECT event_type, nd AS n_days,
       CAST(CASE WHEN nd * sxx - sx * sx = 0 THEN 0
            ELSE (nd * sxy - sx * sy) * 10000 // (nd * sxx - sx * sx)
            END AS BIGINT) AS slope_bp
FROM s
"""


# ---- top session paths (ordered-sequence aggregation) ----


def _paths_part(gap_us: int, plen: int):
    def paths_body(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"path": pd.Series([], dtype=str),
                              "n_p": pd.Series([], dtype=np.int64)})
        if not len(df):
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy(dtype=np.int64)
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        et = df["event_type"].to_numpy()
        n = len(df)
        new_s = np.ones(n, dtype=bool)
        same = uid[1:] == uid[:-1]
        within = (ts_us[1:] - ts_us[:-1]) <= gap_us
        new_s[1:] = ~(same & within)
        sid = np.cumsum(new_s)                       # unique per session here
        seg = np.flatnonzero(new_s)
        step = np.arange(n) - np.repeat(seg, np.diff(np.r_[seg, n]))
        keep = step < plen
        joined = pd.Series(et[keep]).groupby(sid[keep], sort=False).agg(">".join)
        counts = joined.value_counts()
        return pd.DataFrame({"path": counts.index.to_numpy(),
                             "n_p": counts.to_numpy(np.int64)})

    return paths_body


def _make_path_topk(n: int):
    def path_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_sessions", "path"],
                            ascending=[False, True]).head(n).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["rank", "path", "n_sessions"]]

    path_topk.__name__ = "path_topk"
    return path_topk


def event_topk_paths(sf_dir: str, gap_minutes: int = 30, plen: int = 5,
                     n: int = 20):
    """(rank, path, n_sessions) — the corpus's n most common session
    OPENING PATHS: the first ``plen`` event types of each session (the
    `sessionize_events` 30-min-gap rule) joined 'a>b>c', counted across
    all sessions, ties broken (count desc, path asc). The
    product-analytics Sankey / user-journey aggregation — an
    ORDERED-SEQUENCE aggregate, a class the windowed/funnel ops don't
    cover (funnel fixes the step set; this discovers the sequences).

    Shape: ONE user_id hash shuffle (sessions never straddle uparts);
    the per-group body is the vectorized gaps-and-islands scan of
    `sessionize_events` plus one per-session join, emitting (path,
    count) PARTIALS — path-cardinality rows, never events. A path
    groupby sums partials; per-block local top-n then one bounded
    n x n_blocks merge (the `top_bigrams` idiom) — the path-vocabulary
    table is never collected."""
    from ray.data.aggregate import Sum

    gap_us = gap_minutes * 60 * 1_000_000
    ds = read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    parts = ds.map_batches(_add_upart, batch_format="pyarrow")
    partials = parts.groupby("upart").map_groups(
        _paths_part(gap_us, plen), batch_format="pandas")
    summed = partials.groupby("path").aggregate(Sum("n_p", alias_name="n_sessions"))

    def local_topn(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["n_sessions", "path"],
                                       ascending=[False, True]).head(n)
        return pa.table({"g": int64_col(np.zeros(len(df), np.int64)),
                         "path": pa.array(df["path"].tolist(), pa.string()),
                         "n_sessions": int64_col(df["n_sessions"].to_numpy(np.int64))})

    pruned = summed.map_batches(local_topn, batch_format="pyarrow")
    return pruned.groupby("g").map_groups(
        lambda df: _make_path_topk(n)(df), batch_format="pandas") \
        .select_columns(["rank", "path", "n_sessions"])


def event_topk_paths_sql(gap_minutes: int = 30, plen: int = 5,
                         n: int = 20) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), stepped AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sid
                               ORDER BY ts, event_id) AS step
  FROM sess
), paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM stepped WHERE step <= {plen} GROUP BY user_id, sid
), counts AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS rnk
  FROM counts)
SELECT CAST(rnk AS BIGINT) AS rank, path, CAST(n_sessions AS BIGINT) AS n_sessions
FROM ranked WHERE rnk <= {n}
"""


# ---- stream dedup (drop rapid repeats of the same user+type) ----


def _dedup_window_part(window_us: int):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"],
                            kind="mergesort")
        if len(df) == 0:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="object"),
                "ts_us": pd.Series(dtype="int64"),
                "prev_gap_us": pd.Series(dtype="int64"),
            })
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        n = len(df)
        same = np.zeros(n, dtype=bool)
        same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        gap = np.full(n, -1, dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        gap[~same] = -1                     # first of its (user, type)
        keep = (~same) | (gap > window_us)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[keep],
            "user_id": uid[keep],
            "event_type": et[keep],
            "ts_us": ts_us[keep],
            "prev_gap_us": gap[keep],
        })

    return body


def event_dedup_window(sf_dir: str, window_seconds: int = 60):
    """(event_id, user_id, event_type, ts_us, prev_gap_us) — stream
    deduplication: drop any event that repeats the same (user, type)
    within ``window_seconds`` of the IMMEDIATELY PRECEDING event of
    that pair (ties on ts keep the lowest event_id first). The
    at-least-once-delivery scrub every event pipeline runs before
    aggregation — double-fired webhooks, client retries, duplicated
    log shipping all land within seconds of the original.
    ``prev_gap_us`` (-1 for a pair's first event) carries the measured
    silence so downstream monitors can tune the window.

    Lag semantics (vs previous EVENT, not previous KEPT event) keep
    both sides a single vectorized scan — the throttle variant would
    need a sequential pass; this is the form SQL's ``lag()`` and every
    stream processor's dedup operator use.

    Shape: the ONE ``user_id % _N_UPARTS`` hash exchange every events
    op shares, then a per-group sorted shifted-compare — same
    partitioning assumption (one user's history per group, documented
    above) and zero additional shuffles."""
    window_us = window_seconds * 1_000_000
    ds = read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    parts = ds.map_batches(_add_upart, batch_format="pyarrow")
    return parts.groupby("upart").map_groups(
        _dedup_window_part(window_us), batch_format="pandas")


def event_dedup_window_sql(window_seconds: int = 60) -> str:
    window_us = window_seconds * 1_000_000
    return f"""
WITH g AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS gap
  FROM events)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(ts_us AS BIGINT) AS ts_us,
       CAST(COALESCE(gap, -1) AS BIGINT) AS prev_gap_us
FROM g
WHERE gap IS NULL OR gap > {window_us}
"""


# ---- dyadic Count-Min quantile sketch (mergeable rank queries) ------
#
# Fourth member of the mergeable-sketch family (HLL registers / the
# Misra-Gries summary / the point-query CMS in textstats.py): QUANTILE
# queries from a fixed-size sketch. Construction is the classic dyadic
# decomposition over a Count-Min sketch (Cormode & Muthukrishnan 2005,
# "An improved data stream summary: the count-min sketch and its
# applications", section on range queries / quantiles): the cents
# universe [0, 2^L) is covered by L levels of dyadic buckets
# (bucket = cents >> level); each level keeps its own d x w CMS whose
# cells are exact int64 SUMS — so the merged sketch is bit-identical
# on any partitioning / cluster shape, and every face below is
# SQL-hash-verified. A quantile is answered by a deterministic
# root-to-leaf walk: at each level, estimate the left child's count
# (min over the d salted-md5 cells, each an exact sum and therefore a
# one-sided OVERestimate) and descend left iff the accumulated
# below-count reaches the target rank k. One-sided guarantee, held
# deterministically for any input: the returned cent v-hat satisfies
# true_count(< v-hat) <= acc <= k-1, i.e. v-hat <= the exact k-th
# smallest cent — driver-verified in the oracled-empty
# ``value_quantiles_sketch_violations`` row.

_DQS_L = 20                       # levels: cents universe [0, 2^20)
_DQS_D = 3                        # CMS depth per level
_DQS_W = 1024                     # CMS width per level
_DQS_QS_BP = (5000, 9000, 9900)   # p50 / p90 / p99 as basis points


def _dqs_col(level: int, j: int, bucket: int) -> int:
    """Cell column of ``bucket`` in row ``j`` of level ``level``'s CMS:
    md5 low-64 of 'level:j:bucket' (== DuckDB
    ``md5_number_lower(level || ':' || j || ':' || bucket)``) mod w."""
    import hashlib

    h = hashlib.md5(f"{level}:{j}:{bucket}".encode("utf-8")).digest()
    return int.from_bytes(h[8:16], "little") % _DQS_W


def _dqs_clamp(v: np.ndarray) -> np.ndarray:
    c = cents(v)
    return np.clip(c, 0, (1 << _DQS_L) - 1)


class _DyadicQuantilePartial:
    """batch -> ONE row holding the L x d x w dyadic sketch of the
    batch's clamped cents. Per-level placement hashes are computed per
    DISTINCT bucket (distinct count halves per level), memoized across
    batches in a per-actor cache — setup state lives in the actor, the
    shuffle carries one fixed ~480 KiB row per 64 Ki-event batch."""

    def __init__(self):
        self._colcache: dict[tuple[int, int], np.ndarray] = {}

    def _cols(self, level: int, buckets: np.ndarray) -> np.ndarray:
        out = np.empty((_DQS_D, len(buckets)), dtype=np.int64)
        for i, b in enumerate(buckets.tolist()):
            key = (level, b)
            got = self._colcache.get(key)
            if got is None:
                got = np.array([_dqs_col(level, j, b)
                                for j in range(_DQS_D)], dtype=np.int64)
                if len(self._colcache) < (1 << 18):
                    self._colcache[key] = got
            out[:, i] = got
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        c = _dqs_clamp(v)
        cells = np.zeros((_DQS_L, _DQS_D, _DQS_W), dtype=np.int64)
        for level in range(_DQS_L):
            uniq, cnt = np.unique(c >> level, return_counts=True)
            cols = self._cols(level, uniq)
            for j in range(_DQS_D):
                np.add.at(cells[level, j], cols[j], cnt)
        return pa.table({
            "cells": pa.array([cells.tobytes()], pa.binary()),
            "n_p": pa.array([len(v)], pa.int64())})


def _merged_dqs(sf_dir: str) -> tuple[np.ndarray, int]:
    """(summed L x d x w sketch, total event count) — the driver folds
    one bounded row per batch, exactly the HLL/CMS merge shape."""
    partial = read(sf_dir, "events", ["value"]).map_batches(
        _DyadicQuantilePartial, batch_format="pyarrow", batch_size=65536,
        concurrency=(1, 4))
    cells = np.zeros((_DQS_L, _DQS_D, _DQS_W), dtype=np.int64)
    n = 0
    for b in partial.iter_batches(batch_format="pyarrow"):
        for buf in b.column("cells").to_pylist():
            cells += np.frombuffer(buf, dtype=np.int64).reshape(
                _DQS_L, _DQS_D, _DQS_W)
        n += int(b.column("n_p").to_numpy(zero_copy_only=False).sum())
    return cells, n


def value_quantiles_sketch_cells(sf_dir: str):
    """(level, row, col, count) for every nonzero cell of the merged
    dyadic sketch — the integer-exact face, hash-verified cell for
    cell against the SQL replay of the salted-md5 placement."""
    cells, _ = _merged_dqs(sf_dir)
    lv, rows, cols = np.nonzero(cells)
    return pa.table({"level": int64_col(lv.astype(np.int64)),
                     "row": int64_col(rows.astype(np.int64)),
                     "col": int64_col(cols.astype(np.int64)),
                     "count": int64_col(cells[lv, rows, cols])})


def _dqs_cells_cte() -> str:
    """Shared SQL prefix computing the sketch cells from ``events``."""
    return f"""
b AS (
  SELECT LEAST(GREATEST(CAST(floor(value * 100 + 0.5) AS BIGINT), 0),
               {(1 << _DQS_L) - 1}) AS cents
  FROM events),
lv AS (
  SELECT l.l AS level, b.cents >> l.l AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM b CROSS JOIN range(0, {_DQS_L}) l(l)
  GROUP BY l.l, b.cents >> l.l),
cells AS MATERIALIZED (
  SELECT level, j.j AS row,
         CAST(CAST(md5_number_lower(CAST(level AS VARCHAR) || ':' ||
                                    CAST(j.j AS VARCHAR) || ':' ||
                                    CAST(bucket AS VARCHAR))
                   AS UHUGEINT) % {_DQS_W} AS BIGINT) AS col,
         CAST(sum(n) AS BIGINT) AS count
  FROM lv CROSS JOIN range(0, {_DQS_D}) j(j)
  GROUP BY level, j.j, col)"""


def value_quantiles_sketch_cells_sql() -> str:
    return f"""
WITH {_dqs_cells_cte()}
SELECT level, row, col, count FROM cells
"""


def _dqs_walk(cells: np.ndarray, k: int) -> int:
    """Deterministic root-to-leaf descent for target rank ``k`` (1-based)
    over the merged sketch; returns the answer cent."""
    b = 0          # current bucket at level (l+1); root = bucket 0
    acc = 0        # estimated count strictly below current interval
    for level in range(_DQS_L - 1, -1, -1):
        left = 2 * b
        est = min(int(cells[level, j, _dqs_col(level, j, left)])
                  for j in range(_DQS_D))
        if acc + est >= k:
            b = left
        else:
            acc += est
            b = left + 1
    return b


def value_quantiles_sketch(sf_dir: str):
    """(q_bp, k, est_cents) — p50/p90/p99 of ``value`` estimated purely
    from the merged dyadic sketch. Because the cells are exact integer
    sums and the walk is deterministic, the estimate itself is
    partitioning-independent and hash-verified against a generated SQL
    replay that unrolls the same L-level walk as chained CTEs. The
    target rank is the pure-integer ``k = (q_bp*n + 9999) // 10000``
    (ceil of q*n with no float q to diverge over)."""
    cells, n = _merged_dqs(sf_dir)
    qs, ks, est = [], [], []
    for q_bp in _DQS_QS_BP:
        k = (q_bp * n + 9999) // 10000
        qs.append(q_bp)
        ks.append(k)
        est.append(_dqs_walk(cells, k))
    return pa.table({"q_bp": int64_col(np.array(qs, np.int64)),
                     "k": int64_col(np.array(ks, np.int64)),
                     "est_cents": int64_col(np.array(est, np.int64))})


def value_quantiles_sketch_sql() -> str:
    """Generated replay of the root-to-leaf walk: one CTE per level,
    each carrying (bucket, acc) per target rank, reading the left
    child's d cells via correlated salted-md5 lookups."""
    def child_est(level: int, var: str) -> str:
        lookups = []
        for j in range(_DQS_D):
            lookups.append(
                f"COALESCE((SELECT count FROM cells c WHERE c.level = {level}"
                f" AND c.row = {j} AND c.col = CAST("
                f"CAST(md5_number_lower('{level}:{j}:' ||"
                f" CAST(2 * p.{var} AS VARCHAR)) AS UHUGEINT)"
                f" % {_DQS_W} AS BIGINT)), 0)")
        return "LEAST(" + ", ".join(lookups) + ")"

    qcols = [f"q{q_bp}" for q_bp in _DQS_QS_BP]
    top = ", ".join(
        f"0 AS b_{c}, CAST(0 AS BIGINT) AS acc_{c}, "
        f"CAST(({q_bp} * (SELECT n FROM tot) + 9999) // 10000 AS BIGINT)"
        f" AS k_{c}"
        for c, q_bp in zip(qcols, _DQS_QS_BP))
    ctes = [f"lvl{_DQS_L} AS (SELECT {top})"]
    for level in range(_DQS_L - 1, -1, -1):
        parts = []
        for c in qcols:
            e = child_est(level, f"b_{c}")
            parts.append(
                f"CASE WHEN p.acc_{c} + {e} >= p.k_{c}"
                f" THEN 2 * p.b_{c} ELSE 2 * p.b_{c} + 1 END AS b_{c}, "
                f"CASE WHEN p.acc_{c} + {e} >= p.k_{c}"
                f" THEN p.acc_{c} ELSE p.acc_{c} + {e} END AS acc_{c}, "
                f"p.k_{c} AS k_{c}")
        ctes.append(f"lvl{level} AS (SELECT " + ", ".join(parts)
                    + f" FROM lvl{level + 1} p)")
    unions = " UNION ALL ".join(
        f"SELECT CAST({q_bp} AS BIGINT) AS q_bp, k_{c} AS k,"
        f" CAST(b_{c} AS BIGINT) AS est_cents FROM lvl0"
        for c, q_bp in zip(qcols, _DQS_QS_BP))
    return (f"WITH {_dqs_cells_cte()},\n"
            f"tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),\n"
            + ",\n".join(ctes) + "\n" + unions)


def value_quantiles_sketch_violations(sf_dir: str):
    """(q_bp, est_cents, exact_cents) rows where the one-sided walk
    guarantee ``est_cents <= exact k-th smallest cent`` is VIOLATED —
    expected (and oracled) EMPTY for any input and any partitioning.
    The exact side reuses the mergeable cent-histogram shape (bounded
    bin rows, never the raw values) rather than sorting events."""
    from ray.data.aggregate import Sum

    est_tbl = value_quantiles_sketch(sf_dir)

    def hist_partial(batch: pa.Table) -> pa.Table:
        c = _dqs_clamp(batch.column("value").to_numpy(zero_copy_only=False))
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.table({"cents": int64_col(uniq),
                         "n_p": int64_col(cnt.astype(np.int64))})

    hist = read(sf_dir, "events", ["value"]).map_batches(
        hist_partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("cents").aggregate(Sum("n_p", alias_name="n")) \
        .sort("cents").to_pandas()
    cum = hist["n"].to_numpy(np.int64).cumsum()
    bins = hist["cents"].to_numpy(np.int64)
    out_q, out_e, out_x = [], [], []
    for q_bp, k, est in zip(est_tbl.column("q_bp").to_pylist(),
                            est_tbl.column("k").to_pylist(),
                            est_tbl.column("est_cents").to_pylist()):
        exact = int(bins[int(np.searchsorted(cum, k))])
        if est > exact:
            out_q.append(q_bp)
            out_e.append(est)
            out_x.append(exact)
    return pa.table({"q_bp": int64_col(np.array(out_q, np.int64)),
                     "est_cents": int64_col(np.array(out_e, np.int64)),
                     "exact_cents": int64_col(np.array(out_x, np.int64))})


def value_quantiles_sketch_violations_sql() -> str:
    """The one-sided bound is deterministic, so the oracle is the empty
    set with the matching schema."""
    return """
SELECT CAST(NULL AS BIGINT) AS q_bp, CAST(NULL AS BIGINT) AS est_cents,
       CAST(NULL AS BIGINT) AS exact_cents
WHERE FALSE
"""


# ---- KMV (k-minimum-values) distinct sketch + set intersection ------
#
# Fifth mergeable sketch, motivated by what HLL can NOT do: SET
# OPERATIONS. A KMV sketch (Bar-Yossef et al. 2002 "Counting distinct
# elements in a data stream"; Beyer et al. 2007 SIGMOD for the
# unbiased estimator and set-op algebra) keeps the k smallest hash
# values of a set. Closure property: the k smallest of (A u B) are
# computable from the two sketches alone — so union, intersection and
# Jaccard estimates come from sketch-local math, while HLL registers
# only union. Everything here is integer/hash arithmetic on exact
# values, so BOTH faces (the registers and the pairwise overlap
# estimates) are deterministic, partitioning-independent, and
# hash-verified in SQL.

_KMV_K = 64


def _kmv_hash63(user_ids: np.ndarray) -> np.ndarray:
    """md5 low-63 of the user id's decimal string (the window_user_hll
    hashing convention, masked to 63 bits so the value is a
    nonnegative BIGINT on both sides: DuckDB
    ``md5_number_lower(CAST(user_id AS VARCHAR)) % 2^63``)."""
    import hashlib

    out = np.empty(len(user_ids), dtype=np.int64)
    for i, u in enumerate(user_ids.tolist()):
        h = hashlib.md5(str(u).encode("utf-8")).digest()
        out[i] = int.from_bytes(h[8:16], "little") & ((1 << 63) - 1)
    return out


def _kmv_partial(batch: pa.Table) -> pa.Table:
    """batch -> per-type k smallest DISTINCT user hashes: at most
    n_types x k tiny rows leave each batch regardless of event count."""
    et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
    uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
    out_t, out_h = [], []
    for t in np.unique(et):
        hs = np.unique(_kmv_hash63(np.unique(uid[et == t])))
        hs = hs[:_KMV_K]
        out_t.append(np.full(len(hs), t, object))
        out_h.append(hs)
    if not out_t:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "h": pa.array([], pa.int64())})
    return pa.table({"event_type": pa.array(np.concatenate(out_t), pa.string()),
                     "h": int64_col(np.concatenate(out_h))})


def _kmv_merge_group(df: pd.DataFrame) -> pd.DataFrame:
    hs = np.unique(df["h"].to_numpy(np.int64))[:_KMV_K]
    return pd.DataFrame({"event_type": df["event_type"].iloc[0],
                         "rank": np.arange(1, len(hs) + 1, dtype=np.int64),
                         "h": hs})


def _kmv_sketches(sf_dir: str) -> pd.DataFrame:
    """Merged per-type sketches — one bounded groupby over <= types x k
    rows per batch; group state is sketch-scale, never user-scale."""
    partial = read(sf_dir, "events", ["event_type", "user_id"]).map_batches(
        _kmv_partial, batch_format="pyarrow", batch_size=65536)
    return partial.groupby("event_type").map_groups(
        _kmv_merge_group, batch_format="pandas").to_pandas()


def user_kmv_registers(sf_dir: str):
    """(event_type, rank, h) — each event type's KMV sketch: the k
    smallest md5-low-63 hashes of its distinct user ids, rank-ordered.
    The integer-exact face; merging partial sketches is set-union +
    re-truncate, so the result is identical on any partitioning."""
    df = _kmv_sketches(sf_dir).sort_values(["event_type", "rank"])
    return pa.table({"event_type": pa.array(df["event_type"], pa.string()),
                     "rank": int64_col(df["rank"].to_numpy(np.int64)),
                     "h": int64_col(df["h"].to_numpy(np.int64))})


def user_kmv_registers_sql() -> str:
    return f"""
WITH u AS (
  SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         CAST(CAST(md5_number_lower(CAST(user_id AS VARCHAR)) AS UHUGEINT)
              % 18446744073709551616::UHUGEINT % 9223372036854775808::UHUGEINT
              AS BIGINT) AS h
  FROM u),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rank
  FROM (SELECT DISTINCT event_type, h FROM h))
SELECT event_type, CAST(rank AS BIGINT) AS rank, h
FROM r WHERE rank <= {_KMV_K}
"""


def user_overlap_kmv(sf_dir: str):
    """(type_a, type_b, ku, m, jaccard_bp, union_est, inter_est) for
    every unordered event-type pair — Jaccard / intersection estimates
    from the sketches ALONE (the set algebra HLL lacks):

    - union sketch = k smallest of (S_a u S_b)  (KMV closure);
    - ``m``       = union-sketch hashes present in BOTH sketches;
    - ``jaccard_bp``   = round-half-up of m/ku in basis points —
      pure-integer ``(m*20000 + ku) // (2*ku)``;
    - ``union_est``    = ku if ku < k (sketch is exhaustive -> exact),
      else ``floor((k-1) * 2^63 / h_k)`` (the KMV cardinality
      estimator, h_k = the union sketch's largest hash);
    - ``inter_est``    = ``(m * union_est * 2 + ku) // (2 * ku)``.

    Every quantity is a deterministic integer function of the merged
    sketches, so the whole table hash-verifies against the SQL replay
    (DuckDB runs the same md5 / sort / integer arithmetic)."""
    sk = _kmv_sketches(sf_dir)
    types = sorted(sk["event_type"].unique())
    sets = {t: set(sk.loc[sk["event_type"] == t, "h"].tolist())
            for t in types}
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            uni = sorted(sets[a] | sets[b])[:_KMV_K]
            ku = len(uni)
            m = sum(1 for h in uni if h in sets[a] and h in sets[b])
            if ku < _KMV_K:
                union_est = ku
            else:
                union_est = int((_KMV_K - 1) * float(1 << 63) // uni[-1])
            jaccard_bp = (m * 20000 + ku) // (2 * ku)
            inter_est = (m * union_est * 2 + ku) // (2 * ku)
            rows.append((a, b, ku, m, jaccard_bp, union_est, inter_est))
    if not rows:                     # <2 event types: no pairs, like the SQL
        return pa.table({
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "ku": pa.array([], pa.int64()), "m": pa.array([], pa.int64()),
            "jaccard_bp": pa.array([], pa.int64()),
            "union_est": pa.array([], pa.int64()),
            "inter_est": pa.array([], pa.int64())})
    cols = list(zip(*rows))
    return pa.table({
        "type_a": pa.array(cols[0], pa.string()),
        "type_b": pa.array(cols[1], pa.string()),
        "ku": int64_col(np.array(cols[2], np.int64)),
        "m": int64_col(np.array(cols[3], np.int64)),
        "jaccard_bp": int64_col(np.array(cols[4], np.int64)),
        "union_est": int64_col(np.array(cols[5], np.int64)),
        "inter_est": int64_col(np.array(cols[6], np.int64))})


def user_overlap_kmv_sql() -> str:
    return f"""
WITH u AS (
  SELECT DISTINCT event_type, user_id FROM events),
hh AS (
  SELECT event_type,
         CAST(CAST(md5_number_lower(CAST(user_id AS VARCHAR)) AS UHUGEINT)
              % 18446744073709551616::UHUGEINT % 9223372036854775808::UHUGEINT
              AS BIGINT) AS h
  FROM u),
sk AS (
  SELECT event_type, h
  FROM (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rank
        FROM (SELECT DISTINCT event_type, h FROM hh))
  WHERE rank <= {_KMV_K}),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM sk) a
  JOIN (SELECT DISTINCT event_type FROM sk) b
    ON a.event_type < b.event_type),
uni AS (
  SELECT p.type_a, p.type_b, s.h,
         row_number() OVER (PARTITION BY p.type_a, p.type_b
                            ORDER BY s.h) AS rank
  FROM pairs p
  JOIN (SELECT DISTINCT event_type, h FROM sk) s
    ON s.event_type IN (p.type_a, p.type_b)
  GROUP BY p.type_a, p.type_b, s.h),
unik AS (
  SELECT type_a, type_b, h, rank FROM uni WHERE rank <= {_KMV_K}),
agg AS (
  SELECT u.type_a, u.type_b,
         CAST(count(*) AS BIGINT) AS ku,
         CAST(max(u.h) AS BIGINT) AS hk,
         CAST(sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM unik u
  LEFT JOIN sk sa ON sa.event_type = u.type_a AND sa.h = u.h
  LEFT JOIN sk sb ON sb.event_type = u.type_b AND sb.h = u.h
  GROUP BY u.type_a, u.type_b)
SELECT type_a, type_b, ku, m,
       CAST((m * 20000 + ku) // (2 * ku) AS BIGINT) AS jaccard_bp,
       CAST(CASE WHEN ku < {_KMV_K} THEN ku
                 ELSE CAST(floor(({_KMV_K} - 1) * 9223372036854775808.0 / hk)
                           AS BIGINT) END AS BIGINT) AS union_est,
       CAST((m * (CASE WHEN ku < {_KMV_K} THEN ku
                       ELSE CAST(floor(({_KMV_K} - 1)
                                       * 9223372036854775808.0 / hk)
                                 AS BIGINT) END) * 2 + ku) // (2 * ku)
            AS BIGINT) AS inter_est
FROM agg
"""


# ---- exponential time-decay engagement score ----

_DECAY_HALF_LIFE_DAYS = 14.0
# exp(-(t_ref - ts_us) * _DECAY_C) == 2^(-age_days / half_life)
_DECAY_C = float(np.log(2.0) / (_DECAY_HALF_LIFE_DAYS * 86_400_000_000.0))


def user_decay_score(sf_dir: str):
    """(user_id, n_events, decay_score_ppm) — exponentially
    time-decayed engagement per user (14-day half-life against the
    stream's max timestamp): the recency-weighted activity score
    behind churn features and decayed leaderboards. Each event's
    weight is quantized to integer PPM BEFORE summing (the
    `tfidf_cosine` bp discipline), so the per-user sum is order-free
    and the SQL oracle — which inlines the identical double constant
    via repr round-trip — replays it exactly.

    Shape: one metadata-only pass folds per-batch max timestamps (one
    int per batch to the driver); one map pass emits per-batch
    per-user integer partials; one user-key groupby sums. No event-
    scale state anywhere."""
    from ray.data.aggregate import Sum

    def batch_max(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        m = ts.to_numpy(zero_copy_only=False)
        return pa.table({"m": int64_col([m.max() if len(m) else -2**62])})

    maxes = read(sf_dir, "events", ["ts"]).map_batches(
        batch_max, batch_format="pyarrow",
        batch_size=65536).take_all()          # bounded: one int per batch
    t_ref = max(int(r["m"]) for r in maxes)

    def partial(b: pa.Table) -> pa.Table:
        import math

        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # libm math.exp per element, not np.exp: transcendentals are
        # not IEEE-754-specified, and DuckDB's std::exp is libm-backed
        # — np.exp's SIMD polynomial can diverge by 1 ulp and flip the
        # floor(x*1e6+0.5) boundary (same discipline as the ln oracles).
        # Ages repeat across users, so exponentiate only unique ages.
        age = (t_ref - ts).astype(np.int64)
        uniq_age, age_inv = np.unique(age, return_inverse=True)
        w = np.fromiter((math.exp(-float(a) * _DECAY_C) for a in uniq_age),
                        dtype=np.float64, count=len(uniq_age))
        ppm = np.floor(w[age_inv] * 1_000_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(uid, return_inverse=True)
        return pa.table({
            "user_id": int64_col(uniq),
            "n_p": int64_col(np.bincount(inv).astype(np.int64)),
            "s_p": int64_col(np.bincount(inv, weights=ppm).astype(np.int64))})

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "n_events": b.column("sum(n_p)").cast(pa.int64()),
            "decay_score_ppm": b.column("sum(s_p)").cast(pa.int64())})

    return read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("user_id").aggregate(Sum("n_p"), Sum("s_p")) \
        .map_batches(rename, batch_format="pyarrow")


def user_decay_score_sql() -> str:
    return f"""
WITH t AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
w AS (
  SELECT e.user_id,
         CAST(floor(exp(-(t.tmax - epoch_us(e.ts)) * {_DECAY_C!r})
                    * 1000000 + 0.5) AS BIGINT) AS ppm
  FROM events e CROSS JOIN t)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(ppm) AS BIGINT) AS decay_score_ppm
FROM w GROUP BY user_id
"""
