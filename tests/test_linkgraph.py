"""link extraction, host graph, PageRank vs a numpy oracle."""

import numpy as np

from opensmile_spark.linkgraph import extract_links, host_graph, pagerank


def test_extract_links(spark):
    df = spark.createDataFrame(
        [("a.ex",
          '<a href="https://B.EX/page">to <b>B</b></a>'
          '<a href="/local">rel</a>'
          '<a href="mailto:x@y.z">mail</a>'
          '<a href="http://user@c.ex:8080/p?q=1">c</a>')],
        "host string, html string")
    rows = sorted(extract_links(df).collect(), key=lambda r: r["href"])
    by = {r["href"]: (r["dst_host"], r["anchor_text"]) for r in rows}
    assert by["https://B.EX/page"] == ("b.ex", "to B")  # tag-stripped text
    assert by["/local"] == ("a.ex", "rel")              # relative -> self
    assert by["mailto:x@y.z"] == ("", "mail")           # non-http dropped
    assert by["http://user@c.ex:8080/p?q=1"] == ("c.ex", "c")


def test_host_graph(spark):
    df = spark.createDataFrame(
        [("a.ex", "b.ex"), ("a.ex", "b.ex"), ("a.ex", "a.ex"),
         ("b.ex", "c.ex"), ("a.ex", "")],
        "host string, dst_host string")
    rows = {(r["src"], r["dst"]): r["n_links"]
            for r in host_graph(df).collect()}
    assert rows == {("a.ex", "b.ex"): 2, ("b.ex", "c.ex"): 1}


def _np_pagerank(edges, iters, d=0.85):
    hosts = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, t in edges:
            inflow[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (inflow + dangling / n)
    return {h: r[idx[h]] for h in hosts}


def test_pagerank_matches_numpy(spark):
    edges_py = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                ("d", "c")]  # d is a source-only node; c links back
    edges = host_graph(spark.createDataFrame(
        edges_py, "host string, dst_host string"))
    got = {r["host"]: r["rank"]
           for r in pagerank(edges, iterations=7).collect()}
    want = _np_pagerank(edges_py, 7)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12, h
    # probability mass conserved (dangling handled)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # c receives the most links -> highest rank
    assert max(got, key=got.get) == "c"


def test_pagerank_dangling_only_sink(spark):
    # b has no outlinks: its mass must be redistributed, not lost
    edges = host_graph(spark.createDataFrame(
        [("a", "b")], "host string, dst_host string"))
    got = {r["host"]: r["rank"] for r in pagerank(edges, 3).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["b"] > got["a"]


def test_pagerank_persist_discipline(spark):
    """r6: pagerank persists each iteration's ranks and releases them as
    the next materializes — deep runs must not leak storage (only the
    returned localCheckpoint may survive) and must still match numpy
    beyond the old 5-iteration checkpoint window."""
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    edges_py = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    edges = host_graph(spark.createDataFrame(
        edges_py, "host string, dst_host string"))
    out = pagerank(edges, iterations=12)
    assert jsc.getPersistentRDDs().size() <= base + 1
    got = {r["host"]: r["rank"] for r in out.collect()}
    want = _np_pagerank(edges_py, 12)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-12, h
    assert abs(sum(got.values()) - 1.0) < 1e-9
