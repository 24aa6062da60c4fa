"""End-to-end `spark-submit --py-files` launch — the deployment form the
north rule names. Builds the package zip, submits a real spark-submit
process (its own JVM, the code arriving ONLY via --py-files), runs the
datagen and pipeline subcommands, and checks the parquet outputs."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(tmp_path) -> str:
    zpath = str(tmp_path / "opensmile_spark.zip")
    pkg = os.path.join(REPO, "opensmile_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    return cand if os.path.exists(cand) else shutil.which("spark-submit")


@pytest.mark.slow
def test_spark_submit_pyfiles_pipeline(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not found")
    zpath = _build_zip(tmp_path)
    launcher = tmp_path / "launch.py"
    launcher.write_text(
        "from opensmile_spark.cli import main\nmain()\n")
    corpus = str(tmp_path / "corpus")
    feats = str(tmp_path / "features")

    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)

    def run(*args):
        cmd = [submit, "--master", "local[2]",
               "--conf", "spark.sql.shuffle.partitions=4",
               "--conf", "spark.sql.session.timeZone=UTC",
               "--py-files", zpath, str(launcher), *args]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                           env=env, cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-3000:]
        return r.stdout

    out = run("datagen", "--output", corpus, "--n-convs", "30",
              "--turns", "8")
    assert json.loads(out.strip().splitlines()[-1])["rows"] == 240

    out = run("pipeline", "--input", corpus, "--output", feats,
              "--value-cols", "char_len_sma3",
              "--families", "means,moments",
              "--resumable", "--buckets", "4")
    metrics = json.loads(out.strip().splitlines()[-1])
    assert metrics["buckets_done"] == 4
    assert metrics["rows_out"] > 0
    # the feature table landed and carries the functional columns
    import pandas as pd

    files = [os.path.join(dp, f) for dp, _d, fs in os.walk(feats)
             for f in fs
             if f.endswith(".parquet") and "manifest" not in dp]
    got = pd.concat([pd.read_parquet(f) for f in files])
    assert len(got) == metrics["rows_out"]
    assert "char_len_sma3_amean" in got.columns
    assert "char_len_sma3_stddev" in got.columns


def test_cli_dedup_and_decontaminate_inprocess(spark, tmp_path):
    """The data-pipeline CLI subcommands end-to-end in-process (the active
    session is reused, as under spark-submit): near-dup removal keeps one
    doc per duplicate cluster; decontamination drops eval-leaked docs."""
    import pandas as pd

    from opensmile_spark.cli import main

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [base, base + " tail", "totally different words entirely",
                 "yet another unrelated document body"],
    }))
    dpath, bpath = str(tmp_path / "docs"), str(tmp_path / "bench")
    docs.write.parquet(dpath)
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [9], "text": ["totally different words entirely"],
    })).write.parquet(bpath)

    out1 = str(tmp_path / "deduped")
    main(["dedup", "--input", dpath, "--output", out1, "--jaccard", "0.5"])
    kept = sorted(r["doc_id"]
                  for r in spark.read.parquet(out1).collect())
    assert kept == [1, 3, 4]          # 2 is 1's near-dup -> removed

    out2 = str(tmp_path / "clean")
    main(["decontaminate", "--input", dpath, "--output", out2,
          "--benchmark", bpath])
    kept = sorted(r["doc_id"]
                  for r in spark.read.parquet(out2).collect())
    assert kept == [1, 2, 4]          # 3 matches the benchmark -> removed


def test_cli_sample_inprocess(spark, tmp_path):
    """The sample subcommand: uniform deterministic rate, then domain
    mixing via --strata-col/--weights — output rates and row counts are
    reproducible functions of (key, seed)."""
    import json

    import pandas as pd

    from opensmile_spark.cli import main
    from opensmile_spark.sampling import hash_sample

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(200)),
        "domain": ["web"] * 150 + ["books"] * 50,
        "text": [f"doc {i}" for i in range(200)],
    }))
    dpath = str(tmp_path / "docs")
    docs.write.parquet(dpath)

    out1 = str(tmp_path / "uniform")
    main(["sample", "--input", dpath, "--output", out1,
          "--rate", "0.3", "--seed", "3"])
    got = sorted(r["doc_id"] for r in spark.read.parquet(out1).collect())
    want = sorted(r["doc_id"] for r in
                  hash_sample(docs, 0.3, seed=3).collect())
    assert got == want

    out2 = str(tmp_path / "mixed")
    main(["sample", "--input", dpath, "--output", out2,
          "--strata-col", "domain", "--weights", "web=1,books=1",
          "--seed", "5"])
    by = (spark.read.parquet(out2).groupBy("domain").count().collect())
    counts = {r["domain"]: r["count"] for r in by}
    assert counts["books"] == 50            # binding stratum kept whole
    assert 25 <= counts.get("web", 0) <= 75  # ~50 expected of 150 at 1/3


def test_cli_redact_inprocess(spark, tmp_path):
    """The redact subcommand scrubs in place with --replace and reports
    total redaction counts."""
    import pandas as pd

    from opensmile_spark.cli import main

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["write to a@b.co or c@d.net", "clean text"],
    }))
    dpath = str(tmp_path / "docs")
    docs.write.parquet(dpath)
    out = str(tmp_path / "scrubbed")
    main(["redact", "--input", dpath, "--output", out, "--replace"])
    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(out).collect()}
    assert got[0] == "write to [EMAIL] or [EMAIL]"
    assert got[1] == "clean text"
    cols = spark.read.parquet(out).columns
    assert "text_redacted" not in cols and "n_email" in cols


def test_cli_ingest_inprocess(spark, tmp_path):
    """The ingest subcommand: --init bootstraps the store; a second
    snapshot keeps only unseen, batch-unique docs and appends its delta
    so a third identical snapshot keeps nothing."""
    import pandas as pd

    from opensmile_spark.cli import main

    store = str(tmp_path / "store")
    s1 = str(tmp_path / "snap1")
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha", "beta", "gamma"],
    })).write.parquet(s1)
    out1 = str(tmp_path / "kept1")
    main(["ingest", "--input", s1, "--output", out1, "--store", store,
          "--init"])
    assert spark.read.parquet(out1).count() == 3

    s2 = str(tmp_path / "snap2")
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["beta", "delta", "delta", "epsilon"],
    })).write.parquet(s2)
    out2 = str(tmp_path / "kept2")
    main(["ingest", "--input", s2, "--output", out2, "--store", store,
          "--bloom-bits", "4096"])
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out2).collect())
    assert kept == [11, 13]         # 10 seen, 12 dup of 11

    out3 = str(tmp_path / "kept3")
    main(["ingest", "--input", s2, "--output", out3, "--store", store])
    assert spark.read.parquet(out3).count() == 0

    with pytest.raises(SystemExit):
        main(["ingest", "--input", s2, "--output", store,
              "--store", store])


def test_cli_semdedup_inprocess(spark, tmp_path):
    """The semdedup subcommand prunes planted near-copies to one
    survivor per set."""
    import numpy as np
    import pandas as pd

    from opensmile_spark.cli import main

    rng = np.random.RandomState(0)
    base = rng.randn(4, 16)
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):
            rows.append((vid, [float(x) for x in b + rng.randn(16) * 1e-3]))
            vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(str(tmp_path / "emb"))
    out = str(tmp_path / "dec")
    main(["semdedup", "--input", str(tmp_path / "emb"), "--output", out,
          "--threshold", "0.9", "--clusters", "2", "--iters", "3"])
    dec = spark.read.parquet(out)
    assert dec.count() == 12
    assert dec.filter("keep").count() == 4
