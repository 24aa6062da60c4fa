"""Config-driven pipeline runner — the cConfigManager / SMILEapi analogue.

The reference's primary UX is a declarative config naming a component graph
(`SMILExtract -C config.conf`; ini sections [name:cType] wired by
reader/writer.dmLevel — /root/reference/src/core/configManager.cpp:1746-2460,
SURVEY.md §3.1), with the SMILEapi embedding the same lifecycle
(progsrc/include/smileapi/SMILEapi.h:83-140). The Spark-native equivalent:
a declarative stage list compiled onto one DataFrame — same negotiation
idea (each stage consumes the columns the previous produced), Catalyst does
the wiring/fusion the component manager did by hand.

    config = {
        "stages": [
            {"type": "lld"},
            {"type": "sma", "cols": ["char_len"], "win": 3},
            {"type": "delta", "cols": ["char_len_sma3"], "win": 2},
            {"type": "sessionize", "gap_seconds": 43200},
            {"type": "functionals", "value_cols": ["char_len_sma3"],
             "families": ["means", "moments"],
             "group_cols": ["conv_id", "session_id"]},
        ]
    }
    out = run_config(spark_df, config)

Stage types: lld, sma, delta, preemphasis, sessionize, mvn, mvn_transform
(needs cfg["stats"] DataFrame — the frozen pre-trained stats path),
fullinput_mean, valbased_selector, data_selector, viterbi, functionals,
functionals_sql, backfill (needs cfg["anchors"] DataFrame),
weighted_sma, contour_direction, segment_by_meta, select, filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_config(df: DataFrame, config: dict) -> DataFrame:
    from opensmile_spark.functionals import functionals_kernel, functionals_sql
    from opensmile_spark.lld import compute_lld
    from opensmile_spark.operators import (
        backfill_functionals, contour_direction, data_selector,
        delta_regression, fullinput_mean, mvn, mvn_transform, preemphasis,
        segment_by_meta, sessionize, sma, valbased_selector, weighted_sma,
    )
    from opensmile_spark.operators.viterbi import viterbi_smooth_df

    out = df
    for stage in config["stages"]:
        s = dict(stage)
        kind = s.pop("type")
        if kind == "lld":
            out = compute_lld(out, **s)
        elif kind == "sma":
            out = sma(out, s.pop("cols"), s.pop("win", 3), **s)
        elif kind == "delta":
            out = delta_regression(out, s.pop("cols"), s.pop("win", 2), **s)
        elif kind == "preemphasis":
            out = preemphasis(out, s.pop("cols"), **s)
        elif kind == "sessionize":
            out = sessionize(out, **s)
        elif kind == "mvn":
            out = mvn(out, s.pop("cols"), **s)
        elif kind == "mvn_transform":
            out = mvn_transform(out, s.pop("stats"), s.pop("cols"), **s)
        elif kind == "weighted_sma":
            out = weighted_sma(out, s.pop("cols"), s.pop("length", 5),
                               s.pop("func", "hamming"), **s)
        elif kind == "contour_direction":
            out = contour_direction(out, s.pop("col"), **s)
        elif kind == "segment_by_meta":
            out = segment_by_meta(out, s.pop("meta_col"), **s)
        elif kind == "fullinput_mean":
            out = fullinput_mean(out, s.pop("cols"), **s)
        elif kind == "valbased_selector":
            out = valbased_selector(out, s.pop("gate_col"), **s)
        elif kind == "data_selector":
            out = data_selector(out, **s)
        elif kind == "viterbi":
            out = viterbi_smooth_df(out, s.pop("col"), **s)
        elif kind == "functionals":
            out = functionals_kernel(
                out, s.pop("value_cols"),
                tuple(s.pop("group_cols", ["conv_id"])), **s)
        elif kind == "functionals_sql":
            out = functionals_sql(
                out, s.pop("value_cols"),
                tuple(s.pop("group_cols", ["conv_id"])), **s)
        elif kind == "backfill":
            out = backfill_functionals(
                out, s.pop("anchors"), s.pop("value_cols"), **s)
        elif kind == "select":
            out = out.select(*s["cols"])
        elif kind == "filter":
            out = out.filter(s["condition"])
        else:
            raise ValueError(f"unknown stage type: {kind!r}")
    return out
