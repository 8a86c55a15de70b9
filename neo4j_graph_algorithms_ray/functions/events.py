"""Event-stream operators over a timestamped event table.

The reference is a snapshot batch engine with no streaming/window
surface (SURVEY.md §2 "Streaming/windows/watermarks: none"); these are
the beyond-reference operators a large-scale training-data pipeline
needs over an append-only event log: tumbling-window aggregation,
gap-based sessionization, and a generic distributed as-of join.

Scale design (100 TB event log):

- ``windowed_aggregate`` reduces with an Arrow map-side combine — each
  batch collapses to its distinct (window, keys) rows before any
  exchange, so the shuffle moves per-window partials, not events. Small
  partial sets finalize driver-side with no shuffle at all (same regime
  split as ``util.preagg_sum``).
- ``sessionize`` / ``asof_join`` hash-exchange on the entity key
  (``groupby(key).map_groups``) and are vectorized numpy inside each
  group. The partitioning assumption (documented contract): one key's
  rows fit in a worker — the natural sessionization unit (events per
  user, orders per customer); a key hot enough to break that needs a
  time-bucketed pre-split upstream.

Timestamps are compared as int64 microseconds end-to-end (cast once at
the tagging stage), so no tz/unit coercion happens inside groups.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.util import (SMALL_AGG_DRIVER_LIMIT,
                                             drop_empty_blocks,
                                             to_arrow_blocks)

US = 1_000_000


def _num_buckets(requested: Optional[int]) -> int:
    """Key-exchange bucket count: enough buckets that one bucket's rows
    fit a worker, few enough that per-group UDF overhead stays nil.
    Scale deployments should pass corpus-aware values (rows / worker
    heap); the default tracks cluster width."""
    if requested:
        return int(requested)
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(64, cpus * 8)


def _bucket_of(col, nb: int) -> np.ndarray:
    """Deterministic hash bucket of a key column (int or string), stable
    across workers and sessions (pd.util.hash_array: fixed-key
    SipHash)."""
    arr = col.to_numpy(zero_copy_only=False) if hasattr(col, "to_numpy") \
        else np.asarray(col)
    if arr.dtype == object:
        arr = arr.astype(str).astype(object)
    return (pd.util.hash_array(arr) % np.uint64(nb)).astype(np.int64)


def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """timestamp[*]/int64 column → int64 microseconds since epoch."""
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    return col.cast(pa.int64())


def windowed_aggregate(events: rd.Dataset, window_s: int = 3600,
                       keys: Sequence[str] = ("event_type",),
                       time_col: str = "ts",
                       value_col: str = "value") -> rd.Dataset:
    """Tumbling-window aggregate: (window_start_s, *keys) → row count +
    value sum. Returns columns ``window_start_s`` (int64 epoch seconds,
    floor of the window), ``*keys``, ``n_events``, ``sum_value``.

    One pass of vectorized per-batch bucketing + Arrow map-side combine;
    the exchange carries only per-batch-distinct window rows.
    """
    keys = list(keys)
    win_us = int(window_s) * US

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b.column(time_col)).to_numpy(zero_copy_only=False)
        ws = (ts // win_us) * int(window_s)
        t = pa.table({"window_start_s": ws,
                      **{k: b.column(k) for k in keys},
                      "n_events": np.ones(len(ws), dtype=np.int64),
                      "sum_value": b.column(value_col)})
        g = t.group_by(["window_start_s"] + keys).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")])
        return g.rename_columns(["window_start_s"] + keys
                                + ["n_events", "sum_value"])

    red = events.map_batches(partial, batch_format="pyarrow").materialize()
    gkeys = ["window_start_s"] + keys
    if red.count() <= SMALL_AGG_DRIVER_LIMIT:
        batches = list(red.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 20))
        if not batches:
            return red
        merged = pa.concat_tables(batches).group_by(gkeys).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")])
        return rd.from_arrow(merged.rename_columns(
            gkeys + ["n_events", "sum_value"]))
    out = red.groupby(gkeys).sum(["n_events", "sum_value"])
    return out.rename_columns({"sum(n_events)": "n_events",
                               "sum(sum_value)": "sum_value"})


def sessionize(events: rd.Dataset, gap_s: int = 1800,
               user_col: str = "user_id", time_col: str = "ts",
               id_col: str = "event_id",
               num_buckets: Optional[int] = None) -> rd.Dataset:
    """Gap-based sessionization: a new session starts when the gap to
    the user's previous event exceeds ``gap_s`` (strictly). Returns
    (``id_col``, ``user_col``, ``session_seq``) with ``session_seq`` a
    1-based per-user session index; rows within a user are ordered by
    (time, id) so equal timestamps break ties deterministically.

    Exchange granularity is a COARSE HASH BUCKET of users, not a single
    user: ``groupby(user).map_groups`` invokes the UDF once per key, and
    per-group pandas construction dominates wall time at high key
    cardinality (measured 33x slowdown at 50k users / 2M rows). One
    bucket holds many users; a single lexsort + boundary-reset cumsum
    sessionizes every user in the bucket vectorized.
    """
    gap_us = int(gap_s) * US
    nb = _num_buckets(num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        users = b.column(user_col)
        return pa.table({id_col: b.column(id_col).cast(pa.int64()),
                         user_col: users,
                         "__t": _ts_us(b.column(time_col)),
                         "__b": _bucket_of(users, nb)})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        users = df[user_col].to_numpy()
        codes = pd.factorize(users)[0]
        t = df["__t"].to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, t, codes))
        cc, tt, ii = codes[order], t[order], ids[order]
        ub = np.ones(len(cc), dtype=bool)
        new = np.ones(len(cc), dtype=bool)
        if len(cc) > 1:
            ub[1:] = cc[1:] != cc[:-1]
            new[1:] = ub[1:] | ((tt[1:] - tt[:-1]) > gap_us)
        s = np.cumsum(new)
        starts = np.flatnonzero(ub)
        counts = np.diff(np.append(starts, len(cc)))
        # seq restarts at 1 on each user boundary: s at a user's first
        # row includes that row's own new=1
        seq = s - np.repeat(s[starts], counts) + 1
        return pd.DataFrame({id_col: ii, user_col: users[order],
                             "session_seq": seq.astype(np.int64)})

    tagged = drop_empty_blocks(
        events.select_columns([id_col, user_col, time_col])
        .map_batches(tag, batch_format="pyarrow"))
    return tagged.groupby("__b").map_groups(per_bucket,
                                            batch_format="pandas")


def session_stats(events: rd.Dataset, gap_s: int = 1800,
                  user_col: str = "user_id", time_col: str = "ts",
                  id_col: str = "event_id",
                  num_buckets: Optional[int] = None) -> rd.Dataset:
    """Per-session aggregates under the same gap rule as
    :func:`sessionize`: one row per (user, session) with ``n_events``,
    ``start_us`` (epoch microseconds of the first event) and
    ``duration_us``. Aggregation happens inside the bucket pass itself
    (segment reduce over the session boundaries) — sessions never leave
    the worker as per-event rows, so the exchange after the single
    key-bucket shuffle is one row per session."""
    gap_us = int(gap_s) * US
    nb = _num_buckets(num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        users = b.column(user_col)
        return pa.table({id_col: b.column(id_col).cast(pa.int64()),
                         user_col: users,
                         "__t": _ts_us(b.column(time_col)),
                         "__b": _bucket_of(users, nb)})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        users = df[user_col].to_numpy()
        codes = pd.factorize(users)[0]
        t = df["__t"].to_numpy()
        ids = df[id_col].to_numpy()
        order = np.lexsort((ids, t, codes))
        cc, tt = codes[order], t[order]
        new = np.ones(len(cc), dtype=bool)
        if len(cc) > 1:
            new[1:] = (cc[1:] != cc[:-1]) | ((tt[1:] - tt[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(cc)))
        ends = starts + counts - 1
        # session_seq: running session count, reset at each user boundary
        sess_user = cc[starts]
        ub = np.ones(len(starts), dtype=bool)
        if len(starts) > 1:
            ub[1:] = sess_user[1:] != sess_user[:-1]
        s = np.arange(1, len(starts) + 1, dtype=np.int64)
        fb = np.flatnonzero(ub)
        seq = s - np.repeat(s[fb], np.diff(np.append(fb, len(starts)))) + 1
        return pd.DataFrame({
            user_col: users[order][starts],
            "session_seq": seq.astype(np.int64),
            "n_events": counts.astype(np.int64),
            "start_us": tt[starts].astype(np.int64),
            "duration_us": (tt[ends] - tt[starts]).astype(np.int64)})

    tagged = drop_empty_blocks(
        events.select_columns([id_col, user_col, time_col])
        .map_batches(tag, batch_format="pyarrow"))
    return tagged.groupby("__b").map_groups(per_bucket,
                                            batch_format="pandas")


def asof_join(left: rd.Dataset, right: rd.Dataset, on: str,
              left_time: str, right_time: Optional[str] = None,
              right_cols: Optional[Sequence[str]] = None, *,
              strict: bool = True, suffix: str = "_r",
              fill_value=None,
              num_buckets: Optional[int] = None) -> rd.Dataset:
    """Distributed as-of join: for each left row, attach the columns of
    the latest right row with the same ``on`` key and right time <
    left time (``strict=True``) or <= (``strict=False``). Rows with no
    match get ``fill_value`` (or null) in the attached columns.

    Both sides are tagged into one layout and hash-exchanged on a
    COARSE BUCKET of keys (one shuffle total; see :func:`_num_buckets`
    — per-key groups would pay per-group UDF overhead at high key
    cardinality); inside each bucket every key resolves in one
    vectorized merge (lexsort by key/time/side + boundary-reset
    forward-fill of the last right row). Ray Data has no binary as-of
    operator — this is the documented composition (map_batches tag →
    union → groupby(bucket).map_groups), per the reference-free
    custom-operator recipe. Right rows must be unique per (key, time)
    for a deterministic pick; ties at equal time are broken by right
    row order after the stable sort.
    """
    if right_time is None:
        right_time = left_time
    left = to_arrow_blocks(left)
    right = to_arrow_blocks(right)
    lsch = left.schema()
    rsch = right.schema()
    # a filter over an already-empty dataset yields schema-less blocks
    # (Ray 2.49) — schema() is then None. An empty side still has defined
    # semantics: empty right → no matches (typed fill columns); empty
    # left → empty result.
    lschema = lsch.base_schema if lsch is not None else None
    rschema = rsch.base_schema if rsch is not None else None
    if right_cols is None:
        right_cols = [c for c in rschema.names
                      if c not in (on, right_time)] if rschema else []
    right_cols = list(right_cols)
    lnames = set(lschema.names) if lschema is not None else set()
    out_cols = [c + suffix if c in lnames else c for c in right_cols]
    if lschema is None:
        # schema-less empty left: emit a typed empty result
        ftype = (pa.scalar(fill_value).type if fill_value is not None
                 else pa.float64())
        cols = {on: pa.array([], pa.null())}
        cols.update({oc: pa.array([], ftype) for oc in out_cols})
        return rd.from_arrow(pa.table(cols))
    lcols = lschema.names
    if rschema is None:
        ftype = (pa.scalar(fill_value).type if fill_value is not None
                 else pa.float64())
        rtypes = {c: ftype for c in right_cols}

        def no_match(b: pa.Table) -> pa.Table:
            cols = {c: b.column(c) for c in lcols}
            for c, oc in zip(right_cols, out_cols):
                if fill_value is not None:
                    cols[oc] = pa.array([fill_value] * len(b), ftype)
                else:
                    cols[oc] = pa.nulls(len(b), ftype)
            return pa.table(cols)

        return left.map_batches(no_match, batch_format="pyarrow")
    rtypes = {c: rschema.field(c).type for c in right_cols}

    nb = _num_buckets(num_buckets)

    def tag_left(b: pa.Table) -> pa.Table:
        keys = b.column(on)
        cols = {on: keys, "__t": _ts_us(b.column(left_time)),
                "__side": np.zeros(len(b), dtype=np.int8),
                "__b": _bucket_of(keys, nb)}
        for c in lcols:
            if c != on:
                cols["l__" + c] = b.column(c)
        for c, oc in zip(right_cols, out_cols):
            cols["r__" + oc] = pa.nulls(len(b), rtypes[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        keys = b.column(on)
        cols = {on: keys, "__t": _ts_us(b.column(right_time)),
                "__side": np.ones(len(b), dtype=np.int8),
                "__b": _bucket_of(keys, nb)}
        for c in lcols:
            if c != on:
                cols["l__" + c] = pa.nulls(len(b), lschema.field(c).type)
        for c, oc in zip(right_cols, out_cols):
            cols["r__" + oc] = b.column(c)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    both = drop_empty_blocks(lt.union(rt))

    def close(df: pd.DataFrame) -> pd.DataFrame:
        # single vectorized merge over ALL keys in the bucket: lexsort
        # by (key, time, side), forward-fill the last right-row position,
        # reset at key boundaries. Tie order encodes strictness: strict
        # processes the left row BEFORE an equal-time right row (so it
        # cannot match it), inclusive the reverse.
        codes = pd.factorize(df[on].to_numpy())[0]
        t = df["__t"].to_numpy()
        sd = df["__side"].to_numpy()
        tie = sd if strict else (1 - sd)
        order = np.lexsort((tie, t, codes))
        cs, isr = codes[order], sd[order] == 1
        pos = np.arange(len(cs))
        ff = np.maximum.accumulate(np.where(isr, pos, -1))
        ub = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            ub[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(ub)
        key_start = np.repeat(starts, np.diff(np.append(starts, len(cs))))
        match = np.where(ff >= key_start, ff, -1)[~isr]
        orig = np.arange(len(df))[order]
        lorig = orig[~isr]
        ok = match >= 0
        rmatch = orig[np.clip(match, 0, None)]
        out = {on: df[on].to_numpy()[lorig]}
        for c in lcols:
            if c != on:
                vals = df["l__" + c].to_numpy()[lorig]
                # right-side rows hold nulls in l__* columns, so pandas
                # widened ints to float for the whole group — restore
                if (pa.types.is_integer(lschema.field(c).type)
                        and vals.dtype.kind == "f"):
                    vals = vals.astype(lschema.field(c).type.to_pandas_dtype())
                out[c] = vals
        for oc, c in zip(out_cols, right_cols):
            vals = df["r__" + oc].to_numpy()[rmatch]
            col = pd.Series(vals).where(ok, other=fill_value)
            # left-side rows hold nulls in r__* columns, so the group's
            # dtype is widened — restore ints when every cell is filled
            if fill_value is not None and pa.types.is_integer(rtypes[c]):
                col = col.astype(rtypes[c].to_pandas_dtype())
            out[oc] = col.to_numpy()
        return pd.DataFrame(out)

    return both.groupby("__b").map_groups(close, batch_format="pandas")


def funnel(events: rd.Dataset, steps: Sequence[str], within_s: int = 86400,
           user_col: str = "user_id", time_col: str = "ts",
           type_col: str = "event_type",
           num_buckets: Optional[int] = None) -> rd.Dataset:
    """Funnel analysis: per user, how many of the ordered ``steps`` were
    completed, where step i+1 must occur STRICTLY after step i and
    within ``within_s`` seconds of it. Step time t_i is the earliest
    qualifying event (t_1 = the user's first step-1 event). Returns
    (user, steps_completed) for every user in the log.

    Same exchange shape as sessionize: one coarse user-hash-bucket
    groupby; inside a bucket each step is one vectorized masked
    per-user min (np.minimum.at over factorized user codes) — K passes
    over the bucket's rows, no per-user Python.
    """
    within_us = int(within_s) * US
    nb = _num_buckets(num_buckets)
    steps = list(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    def tag(b: pa.Table) -> pa.Table:
        users = b.column(user_col)
        stp = np.array([step_idx.get(x, -1)
                        for x in b.column(type_col).to_pylist()],
                       dtype=np.int64)
        return pa.table({user_col: users, "__t": _ts_us(b.column(time_col)),
                         "__s": stp, "__b": _bucket_of(users, nb)})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        users = df[user_col].to_numpy()
        codes, uniq = pd.factorize(users)
        t = df["__t"].to_numpy()
        sv = df["__s"].to_numpy()
        n = len(uniq)
        done = np.zeros(n, dtype=np.int64)
        prev_t = np.full(n, -np.inf)
        alive = np.ones(n, dtype=bool)
        for i in range(len(steps)):
            cand = np.full(n, np.inf)
            m = sv == i
            if i == 0:
                sel = m
            else:
                lo = prev_t[codes]
                sel = m & (t > lo) & (t <= lo + within_us) & alive[codes]
            if sel.any():
                np.minimum.at(cand, codes[sel], t[sel])
            hit = alive & np.isfinite(cand)
            done[hit] = i + 1
            prev_t = np.where(hit, cand, prev_t)
            alive = hit
            if not alive.any():
                break
        return pd.DataFrame({user_col: uniq,
                             "steps_completed": done})

    tagged = drop_empty_blocks(
        events.select_columns([user_col, time_col, type_col])
        .map_batches(tag, batch_format="pyarrow"))
    out = tagged.groupby("__b").map_groups(per_bucket, batch_format="pandas")
    return to_arrow_blocks(out)


def retention_cohorts(events: rd.Dataset, bucket_s: int = 604800,
                      user_col: str = "user_id", time_col: str = "ts",
                      num_buckets: Optional[int] = None) -> rd.Dataset:
    """Cohort retention: users are cohorted by the time bucket of their
    FIRST event (epoch-aligned, ``bucket_s`` wide, default weekly);
    output (cohort, age, n_users) = how many of each cohort's users were
    active ``age`` buckets after their cohort bucket (age 0 = the cohort
    bucket itself). The standard engagement-retention matrix.

    Scale shape: per-batch distinct (user, bucket) pairs first (an Arrow
    combine — a user's events collapse per bucket before any exchange),
    one user-bucket groupby to find first-seen, then a map-side combined
    count per (cohort, age). Events never shuffle raw.
    """
    bucket_us = int(bucket_s) * US
    nb = _num_buckets(num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        users = b.column(user_col)
        t = _ts_us(b.column(time_col)).to_numpy(zero_copy_only=False)
        w = (t // bucket_us).astype(np.int64)
        tbl = pa.table({user_col: users, "__w": w,
                        "__b": _bucket_of(users, nb)})
        # batch-local distinct (user, bucket): the map-side combine
        return tbl.group_by([user_col, "__w", "__b"]).aggregate([])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # a user's events span input batches, so the batch-local
        # distinct leaves cross-batch duplicates — final dedup here
        df = df.drop_duplicates([user_col, "__w"])
        codes, uniq = pd.factorize(df[user_col].to_numpy())
        w = df["__w"].to_numpy()
        first = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(first, codes, w)
        cohort = first[codes]
        age = w - cohort
        g = pd.DataFrame({"cohort": cohort, "age": age}) \
            .groupby(["cohort", "age"]).size().reset_index(name="n_users")
        return g

    tagged = drop_empty_blocks(
        events.select_columns([user_col, time_col])
        .map_batches(tag, batch_format="pyarrow"))
    part = tagged.groupby("__b").map_groups(per_bucket, batch_format="pandas")
    from neo4j_graph_algorithms_ray.util import preagg_sum
    out = preagg_sum(to_arrow_blocks(part), ["cohort", "age"], "n_users")
    return out.sort(["cohort", "age"])


def hopping_aggregate(events: rd.Dataset, window_s: int = 3600,
                      hop_s: int = 900,
                      keys: Sequence[str] = ("event_type",),
                      time_col: str = "ts",
                      value_col: str = "value") -> rd.Dataset:
    """Hopping (sliding) window aggregate: windows of ``window_s``
    starting every ``hop_s`` (window_s must be a multiple of hop_s).
    Each event lands in window_s/hop_s overlapping windows — the
    standard stream-analytics smoothing of the tumbling aggregate.

    Scale shape: the replication factor is the constant window_s/hop_s
    (here 4), applied per batch BEFORE the map-side combine, so the
    exchange still carries only per-batch-distinct (window, key) rows —
    the raw event is never shuffled, let alone 4×."""
    assert window_s % hop_s == 0, "window_s must be a multiple of hop_s"
    keys = list(keys)
    reps = window_s // hop_s
    hop_us = int(hop_s) * US

    def partial(b: pa.Table) -> pa.Table:
        ts = _ts_us(b.column(time_col)).to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * int(hop_s)
        n = len(base)
        ws = np.repeat(base, reps) - np.tile(
            np.arange(reps, dtype=np.int64) * int(hop_s), n)
        idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        t = pa.table({"window_start_s": ws,
                      **{k: b.column(k).take(pa.array(idx)) for k in keys},
                      "n_events": np.ones(len(ws), dtype=np.int64),
                      "sum_value": b.column(value_col).take(pa.array(idx))})
        g = t.group_by(["window_start_s"] + keys).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")])
        return g.rename_columns(["window_start_s"] + keys
                                + ["n_events", "sum_value"])

    from neo4j_graph_algorithms_ray.util import preagg_sum
    agg = preagg_sum(events.map_batches(partial, batch_format="pyarrow"),
                     ["window_start_s"] + keys, ["n_events", "sum_value"])
    return agg


def latest_event_per_user(events: rd.Dataset, *, time_col: str = "ts",
                          id_col: str = "event_id",
                          user_col: str = "user_id") -> rd.Dataset:
    """Last-write-wins compaction — the CDC/upsert primitive: per user
    the single most recent event row (ties on timestamp broken by the
    LOWEST event id, a fixed deterministic rule). Returns (user_id,
    ts_us, event_id, event_type, value).

    Scale shape: ``topk_per_group`` with k=1 — every batch shrinks to
    one row per local user before anything shuffles, so the exchange
    carries ≤ |users-per-batch| rows, never raw events. This is how a
    100 TB changelog compacts to current state."""
    def prep(b: pa.Table) -> pa.Table:
        return pa.table({user_col: b.column(user_col),
                         "ts_us": _ts_us(b.column(time_col)),
                         id_col: b.column(id_col),
                         "event_type": b.column("event_type"),
                         "value": b.column("value")})

    from neo4j_graph_algorithms_ray.util import topk_per_group
    prepped = events.map_batches(prep, batch_format="pyarrow")
    out = topk_per_group(prepped, [user_col], "ts_us", 1,
                         descending=True, tie_cols=[id_col])
    from neo4j_graph_algorithms_ray.util import to_arrow_blocks
    return to_arrow_blocks(out).sort(user_col)


def window_topk_types(events: rd.Dataset, window_s: int = 3600, k: int = 3,
                      time_col: str = "ts") -> rd.Dataset:
    """Per tumbling window the top-``k`` event types by count (ties:
    type asc) — the stream-analytics "what's trending this hour" query.
    Composition: ``windowed_aggregate`` map-side combine →
    ``topk_per_group`` bounded reduction; raw events never shuffle."""
    from neo4j_graph_algorithms_ray.util import (to_arrow_blocks,
                                                 topk_per_group)
    agg = windowed_aggregate(events, window_s=window_s,
                             keys=("event_type",), time_col=time_col)
    top = topk_per_group(agg.select_columns(
        ["window_start_s", "event_type", "n_events"]),
        ["window_start_s"], "n_events", k, tie_cols=["event_type"])
    return to_arrow_blocks(top).sort(
        ["window_start_s", "n_events", "event_type"],
        descending=[False, True, False])


def window_anomaly(events: rd.Dataset, window_s: int = 3600,
                   z_threshold: float = 2.0,
                   time_col: str = "ts") -> rd.Dataset:
    """Event-rate anomaly detection: tumbling-window counts scored by
    their z-score against the all-windows mean/population-std →
    (window_start_s, n_events, z, is_anomaly) — the monitoring query a
    100 TB ingest runs over its own firehose.

    Scale shape: the windowed count reduces map-side; the mean/std are
    two scalars computed from the tiny window table; z-scoring is one
    vectorized pass back over it. Raw events shuffle nothing."""
    from neo4j_graph_algorithms_ray.functions.text import round6

    agg = windowed_aggregate(events, window_s=window_s, keys=(),
                             time_col=time_col) \
        .select_columns(["window_start_s", "n_events"]).materialize()
    s = agg.sum("n_events") or 0
    n = agg.count()
    mean = s / n if n else 0.0
    ss = agg.map_batches(
        lambda b: pa.table({"sq": pa.array(
            (b["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
             - mean) ** 2)}),
        batch_format="pyarrow").sum("sq") or 0.0
    std = float(np.sqrt(ss / n)) if n else 0.0

    def score(b: pa.Table) -> pa.Table:
        ne = b["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
        z = round6((ne - mean) / std) if std > 0 else np.zeros(len(ne))
        return pa.table({"window_start_s": b["window_start_s"],
                         "n_events": b["n_events"],
                         "z": pa.array(z),
                         "is_anomaly": pa.array(
                             np.abs(z) > z_threshold)})

    return agg.map_batches(score, batch_format="pyarrow") \
        .sort("window_start_s")


def event_transitions(events: rd.Dataset, *,
                      user_col: str = "user_id", time_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id",
                      num_buckets: Optional[int] = None) -> rd.Dataset:
    """First-order Markov transition counts: for every user's
    time-ordered event stream (ties broken by id, same ordering rule
    as sessionize), count consecutive (from_type -> to_type) pairs
    corpus-wide — the behavioral transition matrix behind funnel
    mining / next-event models. Same coarse-user-hash-bucket exchange
    as sessionize (one lexsort per bucket covers every user in it,
    LAG is a shifted compare), then a map-side-combined global
    groupby-sum over at most |types|^2 keys.

    Returns (from_type, to_type, n)."""
    nb = _num_buckets(num_buckets)

    def tag(b: pa.Table) -> pa.Table:
        users = b.column(user_col)
        return pa.table({id_col: b.column(id_col).cast(pa.int64()),
                         "__u": users,
                         "__ty": b.column(type_col).cast(pa.string()),
                         "__t": _ts_us(b.column(time_col)),
                         "__b": _bucket_of(users, nb)})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        codes = pd.factorize(df["__u"].to_numpy())[0]
        t = df["__t"].to_numpy()
        ids = df[id_col].to_numpy()
        ty = df["__ty"].to_numpy()
        order = np.lexsort((ids, t, codes))
        cc, tt2 = codes[order], ty[order]
        same = np.zeros(len(cc), dtype=bool)
        if len(cc) > 1:
            same[1:] = cc[1:] == cc[:-1]
        frm = np.roll(tt2, 1)[same]
        to = tt2[same]
        g = pd.DataFrame({"from_type": frm, "to_type": to})
        out = g.groupby(["from_type", "to_type"], sort=False) \
               .size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    from neo4j_graph_algorithms_ray.util import preagg_sum
    tagged = drop_empty_blocks(
        events.select_columns([id_col, user_col, time_col, type_col])
        .map_batches(tag, batch_format="pyarrow"))
    partial = tagged.groupby("__b").map_groups(per_bucket,
                                               batch_format="pandas")
    return preagg_sum(partial, ["from_type", "to_type"], "n")
