"""pack_sequences (packed id arrays) + BPE id encoding: exact
reconstruction, budget invariants, padding, unk mapping."""

import pytest
from pyspark.sql import functions as F

from opensmile_spark.bpe import UNK_ID, BPEModel, bpe_encode_ids, bpe_train
from opensmile_spark.packing import pack_sequences


@pytest.fixture()
def ids_df(spark):
    rows = [
        ("a", 0, list(range(0, 7))),       # 7 ids
        ("a", 1, list(range(10, 15))),     # 5 ids
        ("a", 2, list(range(20, 30))),     # 10 ids -> group a: 22 ids
        ("b", 3, list(range(40, 43))),     # 3 ids
        ("b", 4, []),                      # empty doc
        ("b", 5, list(range(50, 59))),     # 9 ids  -> group b: 12 ids
    ]
    return spark.createDataFrame(
        rows, "source string, doc_id long, ids array<int>")


def collect_packs(df, **kw):
    out = pack_sequences(df, ids_col="ids", group_cols=["source"], **kw)
    packs = {}
    for r in out.collect():
        packs[(r["source"], r["pack_id"])] = (
            list(r["input_ids"]), r["n_docs"], r["n_ids"])
    return packs


def test_exact_reconstruction(ids_df):
    packs = collect_packs(ids_df, budget=8)
    # concat of packs in pack_id order == concat of docs in doc_id order
    for src, want in (
        ("a", list(range(0, 7)) + list(range(10, 15)) + list(range(20, 30))),
        ("b", list(range(40, 43)) + list(range(50, 59))),
    ):
        got = []
        for pid in sorted(p for s, p in packs if s == src):
            got.extend(packs[(src, pid)][0])
        assert got == want


def test_budget_exact_except_last(ids_df):
    packs = collect_packs(ids_df, budget=8)
    for src in ("a", "b"):
        pids = sorted(p for s, p in packs if s == src)
        assert pids == list(range(len(pids)))
        for pid in pids[:-1]:
            assert packs[(src, pid)][2] == 8
        assert packs[(src, pids[-1])][2] <= 8


def test_n_docs_counts_straddlers(ids_df):
    packs = collect_packs(ids_df, budget=8)
    # group a, pack 0: doc0 (7 ids) + first id of doc1 -> 2 docs
    assert packs[("a", 0)][1] == 2
    # group b, pack 0: doc3 (3) + empty doc4 + 5 ids of doc5 -> 3 docs
    assert packs[("b", 0)][1] == 3


def test_padding(ids_df):
    packs = collect_packs(ids_df, budget=8, pad_id=-1)
    for (src, pid), (ids, _, n_ids) in packs.items():
        assert len(ids) == 8
        assert ids[n_ids:] == [-1] * (8 - n_ids)


def test_repartition_invariance(ids_df):
    a = collect_packs(ids_df, budget=5)
    b = collect_packs(ids_df.repartition(7), budget=5)
    assert a == b


DOCS = [(0, "the cat sat on the mat"),
        (1, "the cats sat there"),
        (2, "that cat, the other cat")]


def test_bpe_ids_roundtrip(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = bpe_train(df, n_merges=40, min_count=1)
    ids = model.token_ids()
    inv = {v: k for k, v in ids.items()}
    assert UNK_ID not in inv            # 0 reserved for <unk>
    assert model.vocab_size == len(ids) + 1
    out = bpe_encode_ids(df, model).collect()
    texts = dict(DOCS)
    for r in out:
        assert all(i != UNK_ID for i in r["bpe_token_ids"])
        assert "".join(inv[i] for i in r["bpe_token_ids"]) \
            == texts[r["doc_id"]]
        assert r["n_bpe_token_ids"] == len(r["bpe_token_ids"])


def test_bpe_ids_unk(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = bpe_train(df, n_merges=10, min_count=1)
    probe = spark.createDataFrame([(9, "zzz the")], "doc_id long, text string")
    ids = bpe_encode_ids(probe, model).collect()[0]["bpe_token_ids"]
    # 'z' never seen -> each char maps to UNK; ' the' is in-vocab
    assert ids[:3] == [UNK_ID] * 3
    assert all(i != UNK_ID for i in ids[3:])


def test_model_df_roundtrip_with_alphabet(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = bpe_train(df, n_merges=15, min_count=1)
    assert model.alphabet == sorted(model.alphabet) and model.alphabet
    back = BPEModel.from_df(model.to_df(spark))
    assert back.merges == model.merges
    assert back.alphabet == model.alphabet
    assert back.token_ids() == model.token_ids()


def test_end_to_end_tokenize_pack(spark):
    """documents -> train -> encode ids -> pack: global id stream is
    preserved and every pack is budget-exact except the group tails."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = bpe_train(df, n_merges=30, min_count=1)
    enc = bpe_encode_ids(df, model).withColumn("source", F.lit("s"))
    packs = (pack_sequences(enc, budget=6, group_cols=["source"])
             .orderBy("pack_id").collect())
    flat = [i for r in packs for i in r["input_ids"]]
    want = [i for r in sorted(enc.collect(), key=lambda r: r["doc_id"])
            for i in r["bpe_token_ids"]]
    assert flat == want
    assert all(r["n_ids"] == 6 for r in packs[:-1])
