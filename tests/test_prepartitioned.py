"""pre_partitioned kernel path == shuffled path on group-contiguous input."""

import numpy as np
from pyspark.sql import functions as F


def test_pre_partitioned_matches_shuffled(spark, tmp_path):
    from opensmile_spark.datagen import generate_transcripts
    from opensmile_spark.functionals import functionals_kernel
    from opensmile_spark.lld import compute_lld
    from opensmile_spark.operators import sessionize, sma

    t = generate_transcripts(spark, n_convs=200, turns_per_conv=12,
                             session_gap_prob=0.2)
    sess = sessionize(sma(compute_lld(t), ["char_len"], 3),
                      gap_seconds=600.0)
    d = str(tmp_path / "sorted_corpus")
    (sess.repartition(8, "conv_id")
     .sortWithinPartitions("conv_id", "session_id", "turn_idx")
     .write.mode("overwrite").parquet(d))
    laid_out = spark.read.parquet(d)

    fams = ["means", "moments", "percentiles", "regression"]
    a = functionals_kernel(laid_out, ["char_len_sma3"],
                           ("conv_id", "session_id"), families=fams,
                           pre_partitioned=True).toPandas() \
        .set_index(["conv_id", "session_id"]).sort_index()
    b = functionals_kernel(laid_out, ["char_len_sma3"],
                           ("conv_id", "session_id"), families=fams) \
        .toPandas().set_index(["conv_id", "session_id"]).sort_index()
    assert a.index.equals(b.index)          # no duplicated/split groups
    assert len(a) == len(a.index.unique())  # exactly one row per group
    for c in a.columns:
        assert np.allclose(a[c].astype(float), b[c].astype(float),
                           equal_nan=True), c
