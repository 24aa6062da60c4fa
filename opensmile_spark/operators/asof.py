"""Point-in-time as-of merge + backfill — the causal ring-buffer read, as a join.

The reference's buffer protocol IS its temporal-leakage guarantee: a reader
can never observe frames beyond the write cursor (`curW`), and relative reads
are "latest frame with vIdx <= now" (/root/reference/src/include/core/
dataMemoryLevel.hpp:296-311, dataReader.hpp:87-88 getFrameRel). Cross-rate
reads (e.g. pitchJitter reading wave + F0 levels at different periods,
GeMAPSv01b_core.lld.conf.inc:174-179) resolve time via secToVidx
(dataMemory.hpp:132-133) — exactly an as-of lookup.

Spark-first implementation — union + last-non-null over an ordered window:
one shuffle+sort on (key, time), linear work, no O(anchor x rows) blowup,
AQE-skew friendly. For each anchor row, every right column is filled with the
latest right value at ts <= anchor_ts (ties: the right row wins, i.e. a turn
AT the anchor timestamp is visible — mirroring "frame written at t is
readable at t").

`backfill_functionals` materializes whole functional vectors at every
(conv_id, anchor_ts) grid point using a per-conversation vectorized kernel:
for A anchors over N turns it does one sort plus prefix scans — not A
separate window jobs. Physically it is ONE union-tag shuffle + mapInPandas
with a group-carry loop (the functionals_kernel batching discipline), not a
per-conversation cogroup: cogrouped applyInPandas pays ~0.5-1 ms of pandas
dispatch PER GROUP, which at high conversation cardinality dominates the
numpy kernel by an order of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opensmile_spark.exprcache import expr_memo
from opensmile_spark.functionals.kernels import compute_all


def asof_join(
    anchors: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    anchor_ts: str = "anchor_ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
    right_order_col: str | None = None,
) -> DataFrame:
    """For each anchor row: latest `right` row with right_ts <= anchor_ts
    (right_ts < anchor_ts when strict=True). Null columns when no prior row
    exists (the DMEM_PAD_ZERO analogue is a caller-side fillna; padding
    policies per dataMemoryLevel.hpp:26-28).

    `right_order_col` breaks ties between right rows sharing a timestamp:
    the row with the HIGHEST value wins (deterministic across repartitioning
    / cluster runs). Defaults to `turn_idx` when the right side has one;
    without any order column equal-ts winners are partition-order dependent.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    if right_order_col is None and "turn_idx" in right.columns:
        right_order_col = "turn_idx"
    a = anchors.select(
        F.col(on),
        F.col(anchor_ts).alias("__t"),
        F.lit(1).alias("__is_anchor"),
        F.lit(None).cast("long").alias("__ord"),
        *[F.col(c) for c in anchors.columns if c not in (on, anchor_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_anchor"),
        (F.col(right_order_col).cast("long") if right_order_col is not None
         else F.lit(0).cast("long")).alias("__ord"),
        *[F.lit(None).cast(anchors.schema[c].dataType).alias(c)
          for c in anchors.columns if c not in (on, anchor_ts)],
        *[F.col(c) for c in value_cols],
    )
    # non-strict: right rows sort before anchors at equal __t => ties visible;
    # strict: anchors sort first => equal-time right rows NOT visible.
    # __ord orders equal-ts right rows so F.last picks a DEFINED winner
    # (anchors carry null __ord; their relative order is irrelevant since
    # anchor rows are transparent to last(ignorenulls) reads).
    tie_order = F.col("__is_anchor").desc() if strict else F.col("__is_anchor").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), tie_order, F.col("__ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = a.unionByName(r)
    for c in value_cols:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = merged.filter(F.col("__is_anchor") == 1).drop("__is_anchor", "__ord")
    return out.withColumnRenamed("__t", anchor_ts)


@expr_memo
def _backfill_probe(value_cols: tuple, families: tuple, options,
                    expanding: bool):
    """(probe keys, feature names, exp/gather/loop family routing,
    key->source map) for backfill_functionals — derived from fixed
    8-element compute_all probes, pure in its arguments."""
    import numpy as np

    from opensmile_spark.functionals.batched import (
        BATCHED_FAMILIES, BATCHED_SUPPORTED_OPTIONS, EXPANDING_FAMILIES,
        EXPANDING_UNSUPPORTED_KEYS,
    )

    options = options or {}
    probe = list(compute_all(np.arange(1.0, 9.0), list(families), options))
    feat_names = [f"{c}_{k}" for c in value_cols for k in probe]

    batched_fams = [
        f for f in families
        if f in BATCHED_FAMILIES
        and set(options.get(f, {})) <= BATCHED_SUPPORTED_OPTIONS[f]
    ]
    # sum/central-stat families on EXPANDING windows (no trailing bound)
    # take the O(N + A) prefix/blocked-Chan path — linear, not O(sum of
    # window sizes). Routing is per OUTPUT KEY: the two mean-|residual|
    # regression outputs (EXPANDING_UNSUPPORTED_KEYS) are irreducibly
    # per-window, so their family additionally joins the bounded gather,
    # which then fills ONLY those keys.
    exp_fams = [f for f in batched_fams if f in EXPANDING_FAMILIES] \
        if expanding else []
    gather_fams = [f for f in batched_fams if f not in exp_fams]
    loop_fams = [f for f in families if f not in batched_fams]
    key_src: dict[str, str] = {}
    for fam in families:
        sample = compute_all(np.arange(1.0, 9.0), [fam], options)
        src = ("exp" if fam in exp_fams else
               "batched" if fam in batched_fams else "loop")
        residual = False
        for k in sample:
            if src == "exp" and k in EXPANDING_UNSUPPORTED_KEYS:
                key_src.setdefault(k, "batched")
                residual = True
            else:
                key_src.setdefault(k, src)
        if residual and fam not in gather_fams:
            gather_fams.append(fam)
    return probe, feat_names, exp_fams, gather_fams, loop_fams, key_src


def backfill_functionals(
    lld: DataFrame,
    anchors: DataFrame,
    value_cols: list[str],
    families: list[str] | None = None,
    options: dict | None = None,
    window_seconds: float | None = None,
    on: str = "conv_id",
    anchor_ts: str = "anchor_ts",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Functional vectors at every (conv_id, anchor_ts): each anchor sees
    only turns with ts <= anchor_ts (zero temporal leakage, enforced in one
    place), optionally bounded to a trailing window of `window_seconds`.

    Physical strategy: union-tag the turn and anchor tables (side 0 / 1),
    ONE repartition by conv + in-partition sort, then a single mapInPandas
    pass whose batches carry the trailing conversation over to the next
    batch (the functionals_kernel discipline). Each conversation's numpy
    math is unchanged from the cogroup formulation — same sort order, same
    per-conv arrays, bit-identical outputs — but the Python/pandas dispatch
    is amortized over every conversation in an Arrow batch instead of paid
    per conversation. Per-anchor windows are gathered into ONE concatenated
    array and every reduceat-expressible family is computed for ALL anchors
    at once (functionals/batched.py) — no per-anchor Python dispatch; only
    families outside BATCHED_FAMILIES fall back to a per-anchor loop.
    Anchor blocks are chunked so the gathered array stays bounded
    (`max_gather_elems`) regardless of anchor density. Empty windows
    emit NaN features (anchor row is kept so the grid is complete — the
    PAD_ZERO/PAD_NONE choice is the caller's fillna/dropna).

    Cost model per family on an UNBOUNDED (expanding) grid with N turns and
    A anchors per conversation: means/extremes/moments/percentiles and all
    regression keys except the two |residual| means are O(N + A*B) via the
    prefix, blocked-Chan, and offline order-statistic paths
    (batched.compute_expanding) — every default family is linear in the
    conversation, never O(sum of window sizes). Only the two
    |residual|-mean regression keys keep the memory-bounded gather
    (a per-window fit applied to every element is irreducibly
    gather-shaped). With window_seconds set, every family gathers, but the
    window bound caps the work.
    """
    import numpy as np
    import pandas as pd

    from opensmile_spark.functionals.batched import (
        compute_batched, compute_expanding,
    )

    families = families or ["means", "moments", "extremes", "percentiles",
                            "regression"]
    options = options or {}
    max_gather_elems = 16_000_000  # ~128 MB of float64 gather per block

    # probe metadata is pure in (value_cols, families, options, bounded?)
    # and costs several numpy compute_all probes — memoized (exprcache)
    probe, feat_names, exp_fams, gather_fams, loop_fams, key_src = \
        _backfill_probe(tuple(value_cols), tuple(families), options,
                        window_seconds is None)
    schema = (
        f"{on} string, {anchor_ts} timestamp, n_visible long, "
        + ", ".join(f"`{n}` double" for n in feat_names)
    )

    def _one_conv(ts_vals, col_arrays, anchor_vals):
        """Per-conversation math — unchanged from the r5 cogroup
        formulation (same op sequence on the same sorted arrays =>
        bit-identical outputs)."""
        # prefix positions: count of turns with ts <= anchor (searchsorted right)
        hi = np.searchsorted(ts_vals, anchor_vals, side="right")
        if window_seconds is not None:
            lo = np.searchsorted(
                ts_vals,
                anchor_vals - np.timedelta64(int(window_seconds * 1e6), "us"),
                side="left",
            )
        else:
            lo = np.zeros_like(hi)

        A = len(anchor_vals)
        out_cols = {f"{c}_{k}": np.full(A, np.nan) for c in value_cols
                    for k in probe}
        sizes = (hi - lo).astype(np.int64)
        nonempty = np.flatnonzero(sizes > 0)

        # prefix-scan families: one pass over the conversation, no gather
        if exp_fams and nonempty.size:
            for c in value_cols:
                ex = compute_expanding(col_arrays[c], hi[nonempty],
                                       exp_fams, options)
                for k, v in ex.items():
                    if key_src.get(k) == "exp":
                        out_cols[f"{c}_{k}"][nonempty] = v

        # block anchors so the gathered windows stay within the memory cap
        blk_start = 0
        csum = np.cumsum(sizes[nonempty])
        while (gather_fams or loop_fams) and blk_start < nonempty.size:
            base = csum[blk_start - 1] if blk_start > 0 else 0
            blk_end = int(np.searchsorted(
                csum, base + max_gather_elems, side="right"))
            blk_end = max(blk_end, blk_start + 1)
            sel = nonempty[blk_start:blk_end]
            bsizes = sizes[sel]
            bstarts = np.zeros(sel.size, dtype=np.int64)
            bstarts[1:] = np.cumsum(bsizes)[:-1]
            bends = bstarts + bsizes
            # gather index: element j of window i reads lo[i] + (j - bstarts[i])
            gather = (np.arange(int(bsizes.sum()), dtype=np.int64)
                      + np.repeat(lo[sel] - bstarts, bsizes))
            for c in value_cols:
                big = col_arrays[c][gather]
                if gather_fams:
                    bat = compute_batched(big, bstarts, bends,
                                          gather_fams, options)
                    for k, v in bat.items():
                        if key_src.get(k) == "batched":
                            out_cols[f"{c}_{k}"][sel] = v
                if loop_fams:
                    for gi, ai in enumerate(sel):
                        got = compute_all(big[bstarts[gi]:bends[gi]],
                                          loop_fams, options)
                        for k, v in got.items():
                            if key_src.get(k) == "loop":
                                out_cols[f"{c}_{k}"][ai] = v
            blk_start = blk_end
        return sizes, out_cols

    def _process(pdf: pd.DataFrame):
        """All conversations in pdf are complete; rows sorted by
        (__k, __side, __t, __ord): per conv, side-0 turn rows sorted by
        (ts, order) — the cogroup kernel's mergesort order — then side-1
        anchor rows sorted by anchor_ts."""
        k_np = pdf["__k"].to_numpy()
        side_np = pdf["__side"].to_numpy()
        t_np = pdf["__t"].to_numpy()
        vals = {c: pdf[c].to_numpy(dtype=np.float64) for c in value_cols}
        n = len(pdf)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = k_np[1:] != k_np[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        convs, counts, anchor_chunks, size_chunks = [], [], [], []
        feat_chunks: dict[str, list] = {f: [] for f in feat_names}
        for s, e in zip(starts, ends):
            a0 = s + int(np.searchsorted(side_np[s:e], 1, side="left"))
            anchor_vals = t_np[a0:e]
            if anchor_vals.size == 0:
                continue   # conv has turns but no anchors: no output rows
            ts_vals = t_np[s:a0]
            col_arrays = {c: vals[c][s:a0] for c in value_cols}
            sizes, out_cols = _one_conv(ts_vals, col_arrays, anchor_vals)
            convs.append(k_np[s])
            counts.append(anchor_vals.size)
            anchor_chunks.append(anchor_vals)
            size_chunks.append(sizes)
            for f in feat_names:
                feat_chunks[f].append(out_cols[f])
        if not convs:
            return None
        data = {on: np.repeat(np.array(convs, dtype=object),
                              np.array(counts, dtype=np.int64)),
                anchor_ts: np.concatenate(anchor_chunks),
                "n_visible": np.concatenate(size_chunks)}
        for f in feat_names:
            data[f] = np.concatenate(feat_chunks[f])
        return pd.DataFrame(data, columns=[on, anchor_ts, "n_visible"]
                            + feat_names)

    def run(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # hold back the trailing conversation — it may continue in the
            # next batch (a conv's rows are contiguous: sorted input)
            kcol = pdf["__k"]
            mask = (kcol == kcol.iloc[-1]).to_numpy()
            tail_start = int(np.argmax(mask))
            carry = pdf.iloc[tail_start:]
            head = pdf.iloc[:tail_start]
            if len(head):
                out = _process(head)
                if out is not None:
                    yield out
        if carry is not None and len(carry):
            out = _process(carry)
            if out is not None:
                yield out

    left = lld.select(
        F.col(on).alias("__k"),
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("__t"),
        F.col(order_col).cast("long").alias("__ord"),
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    )
    right = anchors.select(
        F.col(on).alias("__k"),
        F.lit(1).alias("__side"),
        F.col(anchor_ts).alias("__t"),
        F.lit(0).cast("long").alias("__ord"),
        *[F.lit(None).cast("double").alias(c) for c in value_cols],
    )
    merged = (
        left.unionByName(right)
        .repartition(F.col("__k"))
        .sortWithinPartitions("__k", "__side", "__t", "__ord")
    )
    return merged.mapInPandas(run, schema=schema)


def incremental_backfill(
    prev_features: DataFrame,
    prev_max_ts: DataFrame,
    lld: DataFrame,
    anchors: DataFrame,
    value_cols: list[str],
    families: list[str] | None = None,
    options: dict | None = None,
    window_seconds: float | None = None,
    on: str = "conv_id",
    anchor_ts: str = "anchor_ts",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
) -> tuple[DataFrame, DataFrame]:
    """Feature-store incremental refresh: recompute point-in-time vectors
    ONLY for conversations that received new turns since the last run,
    carry every other conversation's rows forward untouched.

    `prev_features` / `prev_max_ts` are the previous run's output and its
    per-conv watermark table (conv_id, max_ts, n_rows) — both written by
    the last call. A conv is STALE iff its current (max(ts), count(*))
    pair differs from the recorded watermark (new convs count as stale):
    the count catches late-arriving turns with ts <= the recorded max and
    corrected/deleted rows, which a max-only watermark would silently
    classify fresh. (A same-count in-place VALUE edit at an existing ts is
    still invisible — watermarks are O(1) per conv by design; full
    content-addressed staleness needs a row-hash aggregate, at which point
    run the full recompute.) A legacy (conv_id, max_ts)-only watermark
    table is accepted and degrades to max-equality staleness.
    Cost per refresh is proportional
    to the CHANGED conversations, not the corpus: the stale-conv set is a
    tiny aggregate join (broadcast-able), the recompute runs the normal
    `backfill_functionals` over only those convs' rows and anchors, and
    the carry-forward is an anti-join on the same small set. With daily
    appends touching f% of conversations the refresh does f% of the full
    backfill's work — the difference between re-deriving a 10^12-turn
    feature table nightly and touching only what moved.

    Anchors must be re-supplied for stale convs (typically one per new
    turn plus any standing grid). Returns (features, max_ts) — write both;
    they are next run's `prev_*`. Correctness contract: equals the full
    recompute bit-for-bit (pinned in tests/test_asof.py), because features
    at (conv, anchor) depend only on that conv's rows — conversations are
    independent, so an untouched conv's rows cannot change.
    """
    # localCheckpoint materializes the per-conv watermark aggregate and
    # BREAKS its lineage from `lld` — the production shape anyway (the
    # watermark table is persisted each run and read back next run), and
    # without it every stale-set join back onto `lld`/`anchors` trips
    # Spark's ambiguous-self-join check on the shared scan attributes
    cur_max = (lld.groupBy(on).agg(F.max(ts_col).alias("__cur_max_ts"),
                                   F.count(F.lit(1)).alias("__cur_n"))
               .localCheckpoint(eager=True))
    prev = prev_max_ts.withColumnRenamed("max_ts", "__prev_max")
    changed = (F.col("__prev_max").isNull()
               | (F.col("__cur_max_ts") != F.col("__prev_max")))
    if "n_rows" in prev_max_ts.columns:
        prev = prev.withColumnRenamed("n_rows", "__prev_n")
        changed = changed | (F.col("__cur_n") != F.col("__prev_n"))
    stale = cur_max.join(prev, on, "left").filter(changed).select(on)
    # rename the key on the stale side: it shares lineage with `lld`
    # (cur_max derives from it), and Spark's ambiguous-self-join check
    # rejects a same-name join column on a common parent
    stale_k = stale.select(F.col(on).alias("__stale_key"))

    def only_stale(df, how):
        # DataFrame-bound column refs: the stale side shares lineage with
        # `lld` (it derives from the same scan), and both the lld and
        # anchor sides pass through here before being cogrouped — string
        # or alias-based join columns trip Spark's ambiguous-self-join
        # check on the shared attributes, instance-bound ones do not
        return df.join(F.broadcast(stale_k),
                       df[on] == stale_k["__stale_key"], how)

    # the restricted slices are MATERIALIZED (localCheckpoint) before the
    # cogroup: (a) Spark's ambiguous-self-join check false-positives on a
    # cogroup whose two children both carry joins over a shared scan, and
    # (b) the materialized working set is proportional to the CHANGED
    # conversations — the thing an incremental refresh is sized by anyway
    fresh_feats = backfill_functionals(
        only_stale(lld, "left_semi").localCheckpoint(eager=True),
        only_stale(anchors, "left_semi").localCheckpoint(eager=True),
        value_cols, families, options, window_seconds,
        on, anchor_ts, ts_col, order_col,
    )
    carried = only_stale(prev_features, "left_anti")
    features = carried.unionByName(fresh_feats)
    max_ts = cur_max.withColumnRenamed("__cur_max_ts", "max_ts") \
        .withColumnRenamed("__cur_n", "n_rows")
    return features, max_ts
