"""Unit tests for the vectorized session-window / as-of bodies (no Ray:
the map_groups bodies are plain pandas functions, so a brute-force
python reimplementation checks them directly)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from searchengine_ray.pipelines.events import (_asof_part, _range_part,
                                               _sessionize_part)

GAP_US = 30 * 60 * 1_000_000


def _mk_events(seed=7, n=400, users=9):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01").value // 1000 + np.cumsum(
        rng.integers(1, 90 * 60 * 1_000_000, size=n))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, size=n).astype(np.int64),
        "ts": pd.to_datetime(ts * 1000),
        "event_type": rng.choice(["click", "purchase", "view"], size=n),
        "value": rng.uniform(0, 100, size=n),
    })


def _brute_sessions(df):
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts_us = g["ts"].astype("int64").to_numpy() // 1000
        v_c = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        sid, start = 0, 0
        for i in range(len(g) + 1):
            if i == len(g) or (i > 0 and ts_us[i] - ts_us[i - 1] > GAP_US):
                sid += 1
                out.append((uid, sid, i - start, ts_us[start], ts_us[i - 1],
                            int(v_c[start:i].sum())))
                start = i
    return pd.DataFrame(out, columns=["user_id", "session_id", "n_events",
                                      "start_ts_us", "end_ts_us",
                                      "sum_value_c"])


def _canon(df):
    return (df[sorted(df.columns)].sort_values(sorted(df.columns))
            .reset_index(drop=True).astype("int64"))


def test_sessionize_matches_brute_force():
    df = _mk_events()
    got = _sessionize_part(GAP_US)(df)
    want = _brute_sessions(df)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_sessionize_single_user_one_session():
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [5, 5, 5],
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                              "2024-01-01 00:40"]),
        "value": [1.0, 2.0, 3.0],
    })
    got = _sessionize_part(GAP_US)(df)
    # gaps are 10 and 30 min; 30 min == gap stays in-session (> opens new)
    assert len(got) == 1 and int(got.n_events.iloc[0]) == 3
    assert int(got.session_id.iloc[0]) == 1
    assert int(got.sum_value_c.iloc[0]) == 600


def test_range_join_buckets_match_brute_force():
    # replicate the two-bucket probe duplication + partial-sum scheme
    # end to end against an O(n^2) scan
    df = _mk_events(seed=3)
    w_us = 60 * 60 * 1_000_000
    ts_us = df["ts"].astype("int64").to_numpy() // 1000
    b = ts_us // w_us
    clicks = df.event_type == "click"
    purch = df.event_type == "purchase"
    parts = {}
    for dup in (0, 1):
        for i in np.flatnonzero(purch):
            parts.setdefault(b[i] - dup, []).append(
                (df.event_id.iloc[i], ts_us[i], 1))
    for i in np.flatnonzero(clicks):
        parts.setdefault(b[i], []).append((df.event_id.iloc[i], ts_us[i], 0))
    total = {}
    for rows in parts.values():
        g = pd.DataFrame(rows, columns=["event_id", "ts_us", "kind"])
        out = _range_part(w_us)(g)
        for _, r in out.iterrows():
            total[r.event_id] = total.get(r.event_id, 0) + r.n_recent_p
    c_ts = ts_us[clicks]
    for i in np.flatnonzero(purch):
        want = int(((c_ts > ts_us[i] - w_us) & (c_ts <= ts_us[i])).sum())
        assert total[df.event_id.iloc[i]] == want


def test_asof_matches_brute_force():
    df = _mk_events(seed=11)
    got = _asof_part("purchase", "click")(df)
    want = []
    clicks = df[df.event_type == "click"]
    for _, row in df[df.event_type == "purchase"].iterrows():
        prior = clicks[(clicks.user_id == row.user_id)
                       & (clicks.ts <= row.ts)]
        if len(prior):
            p = prior.sort_values("ts").iloc[-1]
            want.append((row.event_id, row.user_id,
                         row.ts.value // 1000, p.event_id,
                         p.ts.value // 1000))
    want = pd.DataFrame(want, columns=["event_id", "user_id", "ts_us",
                                       "prior_event_id", "prior_ts_us"])
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_paths_part_boundaries():
    """Direct-callable unit test of the session-path body: exact-gap
    events stay in session (rule is strictly-greater), a gap+1us event
    opens a new one, user changes always split, and paths truncate at
    plen."""
    import numpy as np
    import pandas as pd

    from searchengine_ray.pipelines.events import _paths_part

    gap = 30 * 60 * 1_000_000
    t0 = 1_700_000_000_000_000
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime(np.array([
            t0, t0 + gap, t0 + 2 * gap + 1,        # u1: s1=(a,b), s2=(c)
            t0 + 3 * gap + 2,                      # u1: s3=(d)
            t0, t0 + 1,                            # u2: s1=(x,y)
        ], dtype="int64"), unit="us"),
        "event_id": [1, 2, 3, 4, 5, 6],
        "event_type": ["a", "b", "c", "d", "x", "y"],
    })
    out = _paths_part(gap, plen=5)(df).set_index("path")["n_p"]
    assert out.to_dict() == {"a>b": 1, "c": 1, "d": 1, "x>y": 1}
    # plen=1 truncates every session to its opening event
    out1 = _paths_part(gap, plen=1)(df).set_index("path")["n_p"]
    assert out1.to_dict() == {"a": 1, "c": 1, "d": 1, "x": 1}


def test_dedup_window_matches_brute_force():
    """_dedup_window_part vs a per-(user,type) python lag loop, incl.
    the boundary semantics: gap == window drops, gap == window+1 keeps,
    ts ties keep only the lowest event_id."""
    from searchengine_ray.pipelines.events import _dedup_window_part

    df = _mk_events(seed=11, n=500, users=7)
    # force ties + near-window gaps
    df.loc[10, ["user_id", "event_type", "ts"]] = df.loc[
        9, ["user_id", "event_type", "ts"]]
    win_us = 60 * 60 * 1_000_000
    got = _dedup_window_part(win_us)(df)

    want = []
    for (uid, et), g in df.groupby(["user_id", "event_type"]):
        g = g.sort_values(["ts", "event_id"])
        ts_us = g["ts"].astype("int64").to_numpy() // 1000
        eid = g["event_id"].to_numpy()
        prev = None
        for i in range(len(g)):
            gap = -1 if prev is None else ts_us[i] - prev
            if gap == -1 or gap > win_us:
                want.append((eid[i], uid, et, ts_us[i], gap))
            prev = ts_us[i]
    want = pd.DataFrame(want, columns=["event_id", "user_id", "event_type",
                                       "ts_us", "prev_gap_us"])
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
    # the forced exact-tie duplicate must be dropped
    assert 10 not in set(got["event_id"])


def test_dedup_window_boundary():
    from searchengine_ray.pipelines.events import _dedup_window_part

    t0 = 1_700_000_000_000_000
    win = 1_000_000  # 1s
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [5, 5, 5, 5],
        "event_type": ["click"] * 4,
        "ts": pd.to_datetime(np.array(
            [t0, t0 + win, t0 + 2 * win + 1, t0 + 2 * win + 1],
            dtype="int64"), unit="us"),
    })
    out = _dedup_window_part(win)(df)
    # 2: gap == win -> drop; 3: gap == win+1 -> keep; 4: tie with 3 -> drop
    assert list(out["event_id"]) == [1, 3]
    assert list(out["prev_gap_us"]) == [-1, win + 1]


def _mk_sketch_batch(seed, n):
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    return pa.table({
        "event_type": pa.array(
            rng.choice(["click", "view", "error"], size=n).tolist(),
            pa.string()),
        "user_id": pa.array(rng.integers(0, 500, size=n).astype(np.int64)),
        "value": pa.array(np.round(np.exp(rng.normal(3, 1, size=n)), 2)),
    })


def test_dyadic_quantile_sketch_merge_is_partition_invariant():
    """The gate events table fits one batch, so the multi-partial fold
    path needs direct coverage: summing the sketches of any split of
    the rows equals the sketch of all rows (cells are exact sums)."""
    import pyarrow as pa

    from searchengine_ray.pipelines.events import (_DQS_D, _DQS_L, _DQS_W,
                                                   _DyadicQuantilePartial)

    whole = _mk_sketch_batch(3, 700)
    stage = _DyadicQuantilePartial()

    def cells_of(tbl):
        out = stage(tbl)
        return np.frombuffer(out.column("cells")[0].as_py(),
                             dtype=np.int64).reshape(_DQS_L, _DQS_D, _DQS_W)

    full = cells_of(whole)
    for cut in (1, 137, 350, 699):
        parts = cells_of(whole.slice(0, cut)) + cells_of(whole.slice(cut))
        assert (parts == full).all()


def test_kmv_merge_is_partition_invariant():
    """Union + re-truncate of per-split KMV partials equals the sketch
    of all rows, for any split point."""
    from searchengine_ray.pipelines.events import _KMV_K, _kmv_partial

    whole = _mk_sketch_batch(5, 700)

    def sketches_of(tbl):
        out = _kmv_partial(tbl).to_pandas()
        return {t: g["h"].tolist() for t, g in out.groupby("event_type")}

    full = sketches_of(whole)
    for cut in (1, 200, 699):
        a, b = sketches_of(whole.slice(0, cut)), sketches_of(whole.slice(cut))
        for t in full:
            merged = sorted(set(a.get(t, [])) | set(b.get(t, [])))[:_KMV_K]
            assert merged == full[t]
