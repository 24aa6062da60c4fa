"""Deterministic sampling / domain mixing.

Properties checked:
  - determinism: identical keep-set across two invocations
  - rate accuracy: kept fraction within binomial noise of the target
  - nesting: raising a rate only ever ADDS rows (same key+seed ordering)
  - domain_mix: output proportions match the target weights; the binding
    stratum is kept whole
"""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    from opensmile_spark.text import token_count

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return token_count(df).cache()


def test_hash_sample_deterministic_and_accurate(spark, docs):
    from opensmile_spark.sampling import hash_sample

    a = {r[0] for r in hash_sample(docs, 0.4, seed=3).select("doc_id").collect()}
    b = {r[0] for r in hash_sample(docs, 0.4, seed=3).select("doc_id").collect()}
    assert a == b
    n = docs.count()
    # binomial: 500 * 0.4 = 200, sd ~ 11 — allow 5 sd
    assert abs(len(a) - 0.4 * n) < 5 * (0.4 * 0.6 * n) ** 0.5
    # different seed -> different (but similar-sized) set
    c = {r[0] for r in hash_sample(docs, 0.4, seed=4).select("doc_id").collect()}
    assert c != a


def test_samples_nest_as_rate_grows(spark, docs):
    from opensmile_spark.sampling import hash_sample

    small = {r[0] for r in hash_sample(docs, 0.2, seed=1).select("doc_id").collect()}
    big = {r[0] for r in hash_sample(docs, 0.6, seed=1).select("doc_id").collect()}
    assert small <= big


def test_stratified_rates_and_default(spark, docs):
    from pyspark.sql import functions as F

    from opensmile_spark.sampling import stratified_sample

    strat = docs.withColumn(
        "stratum", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"))
    out = stratified_sample(strat, "stratum", {"even": 1.0}, seed=0)
    kept = out.groupBy("stratum").count().collect()
    by = {r[0]: r[1] for r in kept}
    assert by.get("odd", 0) == 0          # default_rate=0 drops odd
    assert by["even"] == strat.filter("stratum = 'even'").count()


def test_domain_mix_hits_target_proportions(spark, docs):
    from pyspark.sql import functions as F

    from opensmile_spark.sampling import domain_mix

    strat = docs.withColumn(
        "stratum",
        F.when(F.col("n_tokens_ws") < 45, "short")
         .when(F.col("n_tokens_ws") < 60, "mid")
         .otherwise("long"))
    base = {r[0]: r[1] for r in strat.groupBy("stratum").count().collect()}
    # target: equal thirds — binding stratum is the scarcest one
    sampled, rates = domain_mix(strat, "stratum",
                                {"short": 1.0, "mid": 1.0, "long": 1.0},
                                seed=5)
    got = {r[0]: r[1] for r in sampled.groupBy("stratum").count().collect()}
    binding = min(base, key=base.get)
    assert rates[binding] == 1.0
    assert got[binding] == base[binding]
    target = base[binding]  # every stratum should land near this size
    for s, n in got.items():
        sd = (target * (1 - rates[s]) * rates[s] + 1) ** 0.5
        assert abs(n - target) < 5 * sd + 5, (s, n, target, rates)


def test_rate_threshold_validation():
    from opensmile_spark.sampling import rate_threshold

    assert rate_threshold(0.0) == 0
    assert rate_threshold(1.0) == 1 << 32
    with pytest.raises(ValueError):
        rate_threshold(1.5)
