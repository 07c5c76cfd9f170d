"""Token-budget shard packing (operators/packing.py)."""

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.operators.packing import pack_shards


def _py_pack(rows, budget):
    """Serial reference: shard = floor(exclusive running sum / budget)."""
    pre, out = 0, {}
    for i, w in sorted(rows):
        out[i] = pre // budget
        pre += w
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, n_tokens: long")


def test_matches_serial_reference_and_partition_invariant(spark):
    rows = [(i, (i * 7919) % 97 + 1) for i in range(500)]
    want = _py_pack(rows, budget=800)
    for parts in (1, 7):
        got = {r["doc_id"]: r["shard_id"] for r in
               pack_shards(_df(spark, rows).repartition(parts),
                           "doc_id", "n_tokens", 800, chunk_size=64)
               .collect()}
        assert got == want


def test_chunk_size_does_not_change_assignment(spark):
    rows = [(i, (i * 31) % 40 + 1) for i in range(300)]
    want = _py_pack(rows, budget=250)
    for cs in (1, 17, 1 << 20):
        got = {r["doc_id"]: r["shard_id"] for r in
               pack_shards(_df(spark, rows), "doc_id", "n_tokens",
                           250, chunk_size=cs).collect()}
        assert got == want


def test_sparse_ids_and_oversized_docs(spark):
    # ids with huge gaps (empty chunks) and a doc far over budget
    rows = [(3, 10), (1000000, 5000), (1000001, 10), (9999999, 10)]
    got = {r["doc_id"]: r["shard_id"] for r in
           pack_shards(_df(spark, rows), "doc_id", "n_tokens",
                       100, chunk_size=10).collect()}
    assert got == _py_pack(rows, budget=100)
    assert got[3] == 0
    assert got[1000000] == 0          # starts in shard 0
    assert got[1000001] == 50         # after the 5010-token prefix
    assert got[9999999] == 50


def test_shards_are_dense_and_monotone(spark):
    rows = [(i, 10) for i in range(200)]
    out = pack_shards(_df(spark, rows), "doc_id", "n_tokens", 100)
    shards = [r["shard_id"] for r in out.orderBy("doc_id").collect()]
    assert shards == sorted(shards)
    assert set(shards) == set(range(20))  # 200 docs * 10 tok / 100


def test_bad_args(spark):
    d = _df(spark, [(1, 1)])
    with pytest.raises(ValueError):
        pack_shards(d, "doc_id", "n_tokens", 0)
    with pytest.raises(ValueError):
        pack_shards(d, "doc_id", "n_tokens", 10, chunk_size=0)


def test_chunk_documents_overlap_and_coverage(spark):
    from tinyetl_spark.operators.packing import chunk_documents
    rows = [(1, " ".join(f"t{i}" for i in range(1, 14))),   # 13 tokens
            (2, "a  b c"),                                  # < chunk_size
            (3, ""), (4, "   ")]                            # no chunks
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(df, chunk_size=8, overlap=4) \
        .orderBy("doc_id", "chunk_id").collect()
    got = [(r.doc_id, r.chunk_id, r.text, r.n_tokens) for r in out]
    assert got == [
        (1, 1, "t1 t2 t3 t4 t5 t6 t7 t8", 8),
        (1, 2, "t5 t6 t7 t8 t9 t10 t11 t12", 8),
        (1, 3, "t9 t10 t11 t12 t13", 5),      # tail start 9 <= 13-4
        (2, 1, "a b c", 3),                   # whitespace normalized
    ]
    # every token appears in at least one chunk; consecutive chunks
    # share exactly `overlap` tokens where full-sized
    toks1 = [c[2].split() for c in got if c[0] == 1]
    assert set().union(*toks1) == {f"t{i}" for i in range(1, 14)}
    assert toks1[0][-4:] == toks1[1][:4]
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)
