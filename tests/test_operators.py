"""Training-data operators: dedup family recall/precision properties,
similarity search, multimodal plumbing."""

import pyspark.sql.functions as F
import pytest

from tinyetl_spark.operators import dedup as D
from tinyetl_spark.operators import multimodal as MM
from tinyetl_spark.operators import similarity as S
from tinyetl_spark.operators import text as T

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),   # near-dup of 0
    (2, "completely different content about spark query engines and shuffles"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),   # exact dup of 0
    (4, "rivers banks and lazy dogs are entirely reordered words here today"),
    (5, "der schnelle braune fuchs springt und der hund und die katze"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates_and_dedup(spark, docs):
    groups = D.exact_duplicates(docs, "doc_id").collect()
    assert len(groups) == 1
    assert list(groups[0]["ids"]) == [0, 3]
    kept = D.exact_dedup(docs, "doc_id")
    assert kept.count() == 5
    assert 3 not in {r["doc_id"] for r in kept.collect()}


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in D.lsh_candidate_pairs(docs, "doc_id", num_hashes=12,
                                            bands=6).collect()}
    assert (0, 3) in pairs                 # exact dups always collide
    assert (0, 1) in pairs or (1, 3) in pairs   # near-dup likely caught
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.0,
                                          num_hashes=12, bands=6).collect()}
    assert jac[(0, 3)] == 1.0
    if (0, 1) in jac:
        assert 0.3 < jac[(0, 1)] < 1.0


def test_minhash_incremental_matches_cross_side_pairs(spark, docs):
    corpus = docs.filter("doc_id % 2 = 0")       # 0, 2, 4
    incoming = docs.filter("doc_id % 2 = 1")     # 1, 3  (3 == exact dup of 0)
    inc = D.dedup_minhash_incremental(corpus, incoming, "doc_id",
                                      threshold=0.0, num_hashes=12, bands=6)
    got = {(r["doc_new"], r["dup_of"]): r["jaccard"] for r in inc.collect()}
    assert got[(3, 0)] == 1.0                    # exact dup across sides
    # every incremental pair must be a cross-side pair of the full pass
    full = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])):
            r["jaccard"]
            for r in D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.0,
                                           num_hashes=12, bands=6).collect()}
    for (n, c), j in got.items():
        assert full[(min(n, c), max(n, c))] == j
    # no same-side pairs can appear
    assert all(n % 2 == 1 and c % 2 == 0 for n, c in got)


def test_minhash_incremental_with_prebuilt_index(spark, docs):
    corpus = docs.filter("doc_id % 2 = 0")
    incoming = docs.filter("doc_id % 2 = 1")
    idx = D.build_lsh_index(corpus, "doc_id", num_hashes=12, bands=6)
    via_index = D.dedup_minhash_incremental(
        corpus, incoming, "doc_id", threshold=0.0, num_hashes=12, bands=6,
        corpus_index=idx).collect()
    direct = D.dedup_minhash_incremental(
        corpus, incoming, "doc_id", threshold=0.0, num_hashes=12,
        bands=6).collect()
    assert sorted(map(tuple, via_index)) == sorted(map(tuple, direct))
    # threshold filters: raising it can only shrink the result
    strict = D.dedup_minhash_incremental(
        corpus, incoming, "doc_id", threshold=0.9, num_hashes=12, bands=6,
        corpus_index=idx).collect()
    assert {tuple(r) for r in strict} <= {tuple(r) for r in direct}
    assert D.release_caches() >= 0


def test_simhash_properties(spark, docs):
    sh = {r["doc_id"]: r["sh"] for r in
          docs.select("doc_id", D.simhash64(F.col("text")).alias("sh")).collect()}
    assert sh[0] == sh[3]                      # identical text -> identical hash
    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert hamming(sh[0], sh[1]) < hamming(sh[0], sh[2])   # near-dup closer
    cands = {(r["doc_a"], r["doc_b"])
             for r in D.simhash_candidates(docs, "doc_id").collect()}
    assert (0, 3) in cands


def test_cosine_topk_self_excluded_and_ranked(spark):
    vecs = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    vecs.append((4, [1.0, 0.1, 0.0, 0.0]))      # close to vec 0
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = S.cosine_topk(df, df.filter("vec_id = 0"), k=2)
    rows = out.orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rows] == [4, 1]
    assert rows[0]["cos"] > 0.99
    assert all(r["neighbor_id"] != 0 for r in rows)


def test_rp_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 3")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.rp_lsh_topk(emb, q, k=5, dim=64, bits=2).collect()}
    # bucketed search returns a subset ranked identically where it overlaps
    assert approx, "LSH returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall > 0.1     # 2-bit signature on random vectors: partial recall expected


def test_text_profile_columns(spark, docs):
    out = T.profile(docs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_tokens"] == 13
    assert by_id[0]["lang_pred"] == "en"
    assert by_id[5]["lang_pred"] == "de"
    assert 0.0 <= by_id[0]["quality"] <= 1.0
    assert by_id[0]["fp"] == by_id[3]["fp"]


def test_multimodal_plumbing(spark):
    rows = [(1, "image", b"\x89PNG fake"), (2, "audio", b"RIFF fake"),
            (3, "image", None)]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    meta = MM.attach_metadata(df)
    m = {r["media_id"]: r for r in meta.collect()}
    assert m[1]["byte_len"] == 9 and m[3]["byte_len"] is None
    feats = MM.extract_features(meta)
    f = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert f[1].startswith("image-feat-")
    assert f[2].startswith("audio-feat-")
    assert f[3] is None
    # registering a real decoder replaces the stub
    MM.DecoderRegistry.register("image", lambda s: s.map(
        lambda b: None if b is None else f"len={len(b)}"))
    try:
        f2 = {r["media_id"]: r["feature"]
              for r in MM.extract_features(meta).collect()}
        assert f2[1] == "len=9"
    finally:
        MM.DecoderRegistry._decoders.pop("image", None)


def test_unknown_media_kind_raises(spark):
    df = spark.createDataFrame([(1, "hologram", b"x")],
                               "media_id long, kind string, payload binary")
    with pytest.raises(Exception, match="hologram"):
        MM.extract_features(MM.attach_metadata(df)).collect()


# ------------------------------------------------------ simhash value oracle

# Pure-Python XXH64 (public spec, seed 42 = Spark's xxhash64 seed) so the
# SimHash signature — not oracle-checkable in DuckDB (no xxhash64) — gets a
# value-level check against an independent reimplementation.
# (implementation now lives in tinyetl_spark.partitioning — the
# same pure-Python spec code, still checked against the JVM here)
from tinyetl_spark.partitioning import xxh64


def _simhash_py(text: str, ngram: int = 2) -> int:
    """Driver-side mirror of dedup.simhash64 (norm_text -> word n-grams ->
    xxhash64 bit votes)."""
    import re
    nt = re.sub(r"\s+", " ", text.lower()).strip()
    ws = nt.split(" ")
    if len(ws) >= ngram:
        grams = list(dict.fromkeys(
            " ".join(ws[i:i + ngram]) for i in range(len(ws) - ngram + 1)))
    else:
        grams = [nt]
    hs = [xxh64(g.encode("utf-8")) for g in grams]
    out = 0
    for b in range(64):
        votes = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if votes > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


def test_xxh64_matches_spark(spark):
    samples = ["", "a", "hello world", "the quick brown fox", "x" * 100,
               "päge ünïcode ☃ content"]
    got = spark.createDataFrame([(s,) for s in samples], "s string") \
        .select(F.xxhash64("s").alias("h")).collect()
    for s, r in zip(samples, got):
        expect = xxh64(s.encode("utf-8"))
        expect = expect - (1 << 64) if expect >= (1 << 63) else expect
        assert r["h"] == expect, f"xxh64 mismatch for {s!r}"


def test_simhash_values_match_python_oracle(spark, docs):
    got = {r["doc_id"]: r["sh"] for r in
           docs.select("doc_id", D.simhash64(F.col("text")).alias("sh")).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _simhash_py(text), f"simhash mismatch doc {doc_id}"


def _simhash_md5_votes_py(text: str, ngram: int = 2) -> list:
    """Driver-side mirror of dedup.simhash_votes_md5 (bit b of the gram
    hash = bit (b%4) of md5 hex char (b//4))."""
    import hashlib
    import re
    nt = re.sub(r"\s+", " ", text.lower()).strip()
    ws = nt.split(" ")
    if len(ws) >= ngram:
        grams = list(dict.fromkeys(
            " ".join(ws[i:i + ngram]) for i in range(len(ws) - ngram + 1)))
    else:
        grams = [nt]
    hs = [hashlib.md5(g.encode("utf-8")).hexdigest() for g in grams]
    votes = []
    for b in range(64):
        v = sum(1 if (int(h[b // 4], 16) >> (b % 4)) & 1 else -1 for h in hs)
        votes.append(v)
    return votes


def test_simhash_md5_votes_match_python_oracle(spark, docs):
    got = {r["doc_id"]: list(r["v"]) for r in
           docs.select("doc_id",
                       D.simhash_votes_md5(F.col("text")).alias("v")).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _simhash_md5_votes_py(text), f"doc {doc_id}"


def test_simhash_md5_candidates(spark, docs):
    cands = {(r["doc_a"], r["doc_b"])
             for r in D.simhash_candidates_md5(docs, "doc_id").collect()}
    assert (0, 3) in cands                 # exact dup always collides
    # banded keys derived from the python vote oracle agree with Spark's
    votes = _simhash_md5_votes_py(DOCS[0][1])
    keys = [sum((1 << j) for j in range(16) if votes[b * 16 + j] > 0)
            for b in range(4)]
    assert all(0 <= k < (1 << 16) for k in keys)


def test_approx_distinct_within_rsd(spark):
    df = spark.createDataFrame([(i % 997,) for i in range(20000)], "u long")
    got = df.agg(F.approx_count_distinct("u").alias("a")).collect()[0]["a"]
    assert abs(got - 997) <= 997 * 0.05    # default rsd 5%


def test_dedup_releases_caches(spark, docs):
    D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.0).collect()
    # the NEXT dedup call releases the previous call's caches ...
    D.lsh_candidate_pairs(docs, "doc_id").collect()
    # ... and explicit release clears the rest: nothing stays pinned.
    assert D.release_caches() > 0
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_banded_lsh_finds_exact_dups_and_bounds_candidates(spark):
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
    rows += [(1000 + i, rows[i][1]) for i in range(0, 200, 10)]  # 20 exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = S.cosine_dup_pairs(df, threshold=0.99, dim=64, bits=16, bands=4)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    for i in range(0, 200, 10):
        assert (i, 1000 + i) in got     # identical vectors collide in every band
    # sharp buckets: random non-dup vectors should almost never pair up
    assert len(got) <= 25


def test_asof_join_semantics(spark):
    from datetime import datetime
    from tinyetl_spark.operators.asof import asof_join
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(10)), (2, 10, t(5)), (3, 10, t(2)), (4, 99, t(30))],
        "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, t(3), "a"), (10, t(5), "b"), (10, t(20), "c"), (77, t(1), "x")],
        "k long, rts timestamp, v string")
    out = {r["id"]: r["v_asof"] for r in
           asof_join(left, right, on=["k"], left_time="ts", right_time="rts",
                     value_cols=["v"]).collect()}
    assert out[1] == "b"      # latest at-or-before t10 is t5
    assert out[2] == "b"      # INCLUSIVE: right row at exactly t5 matches
    assert out[3] is None     # earliest right row (t3) is after t2
    assert out[4] is None     # key with no right rows at all


def test_asof_join_null_value_in_match_wins(spark):
    """DuckDB/pandas ASOF parity: when the true as-of match carries a NULL
    value, the output is NULL — it must NOT fall through to an older right
    row (regression for the last(ignorenulls) pitfall)."""
    from datetime import datetime
    from tinyetl_spark.operators.asof import asof_join
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame([(1, 10, t(10))], "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, t(1), "old", 7), (10, t(5), None, None)],
        "k long, rts timestamp, v string, w long")
    row = asof_join(left, right, on=["k"], left_time="ts", right_time="rts",
                    value_cols=["v", "w"]).collect()[0]
    assert row["v_asof"] is None and row["w_asof"] is None


def test_ivf_topk_recall_vs_brute_force(spark):
    import random
    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 3")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(df, q, k=10).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.ivf_topk(df, q, k=10, n_centroids=8, nprobe=4).collect()}
    # probing half the cells must recover a solid fraction of true top-10
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    # every query produced a full ranked list from the probed cells
    assert len(approx) == 30


def test_ivf_kmeans_refinement_improves_recall(spark):
    """Lloyd refinement (round-5 verdict #5) on a SKEWED synthetic where
    the seed centroids are degenerate: ids 0..15 all sit inside one true
    cluster, so seed-only IVF probes a sliver of the space; two
    distributed k-means steps must spread the centroids toward the real
    clusters and STRICTLY raise recall, with a hard floor above the
    seed-only ceiling. Deterministic end to end (fixed jitter, rounded
    means).

    The in-cluster jitter must be WIDE (±3.5 around centers 10 apart):
    with tiny jitter, cluster-mates are near-duplicates whose cosine
    ordering over the 16 degenerate seeds is identical, so even the
    degenerate quantizer co-locates each cluster in one cell and
    seed-only recall ties the refined run (measured: both 56/60 at
    ±0.5, vs 0.78 -> 0.95 at ±3.5 — wide jitter makes cluster-mates
    scatter across seed cells, which is exactly the failure Lloyd
    refinement exists to fix)."""
    import random
    rnd = random.Random(11)
    dim, n_clusters, per = 8, 6, 60
    rows = []
    for c in range(n_clusters):
        center = [10.0 if d == c else 0.0 for d in range(dim)]
        for j in range(per):
            vid = c * per + j
            rows.append((vid, [center[d] + rnd.uniform(-3.5, 3.5)
                               for d in range(dim)]))
    # degenerate seeds: ids 0..15 are all cluster-0 members already
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(f"vec_id % {per} = 17")           # one query per cluster
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.cosine_topk(df, q, k=10).collect()}

    def recall(iters):
        got = {(r["query_id"], r["neighbor_id"])
               for r in S.ivf_topk(df, q, k=10, n_centroids=16, nprobe=2,
                                   kmeans_iters=iters).collect()}
        return len(exact & got) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 > r0, f"refinement did not improve recall: {r0} -> {r2}"
    assert r2 - r0 >= 0.05, f"improvement not material: {r0} -> {r2}"
    assert r2 >= 0.9, f"refined recall too low: {r2}"
    # determinism: the refined run reproduces itself exactly
    a = sorted(map(tuple, S.ivf_topk(df, q, k=10, n_centroids=16, nprobe=2,
                                     kmeans_iters=2).collect()))
    b = sorted(map(tuple, S.ivf_topk(df, q, k=10, n_centroids=16, nprobe=2,
                                     kmeans_iters=2).collect()))
    assert a == b


def test_semantic_dedup_keep_rule(spark):
    """SemDeDup keep rule on a hand-built two-cell corpus: within a cell
    every near-dup group keeps exactly its farthest-from-centroid member;
    exact copies tie on cent_cos and the lower id wins; vectors with no
    near-dup keep unconditionally."""
    rows = [
        (0, [10.0, 0.0, 0.0, 0.0]),   # seed centroid A
        (1, [0.0, 10.0, 0.0, 0.0]),   # seed centroid B
        (2, [10.0, 1.0, 0.0, 0.0]),   # cell A dup family (cos to 0: .995)
        (3, [10.0, 1.0, 0.0, 0.0]),   # exact copy of 2
        (4, [10.0, 2.0, 0.0, 0.0]),   # cell A, farthest from centroid
        (5, [0.0, 10.0, 0.0, 0.0]),   # exact copy of centroid B
        (6, [0.0, 0.0, 10.0, 0.0]),   # orthogonal: no dup anywhere
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           S.semantic_dedup(df, n_centroids=2, threshold=0.95).collect()}
    assert len(out) == 7                      # one row per input vector
    assert {i for i, r in out.items() if r["keep"]} == {1, 4, 6}
    # the cell-A dup family {0,2,3,4} kept its FARTHEST member (4)
    assert out[4]["cent_cos"] < out[2]["cent_cos"] < out[0]["cent_cos"]
    # exact copies tie on cent_cos; the lower id survives
    assert out[1]["cent_cos"] == out[5]["cent_cos"]
    assert out[1]["keep"] and not out[5]["keep"]


def test_semantic_dedup_kmeans_path_and_no_false_drops(spark):
    """Lloyd-refined path: same per-row contract (one output row per
    vector), deterministic, and random vectors far below the threshold
    are never dropped."""
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.semantic_dedup(df, n_centroids=4, threshold=0.99,
                           kmeans_iters=2)
    got = out.collect()
    assert len(got) == 60
    assert set(out.columns) == {"vec_id", "cell", "cent_cos", "keep"}
    assert all(r["keep"] for r in got)
    again = S.semantic_dedup(df, n_centroids=4, threshold=0.99,
                             kmeans_iters=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_multimodal_resize_and_frame_sampling(spark):
    rows = [(1, "image", b"imgbytes-1"), (2, "video", b"vid-1"),
            (3, "image", None), (4, "audio", b"aud")]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    rz = {r["media_id"]: r for r in MM.resize_images(df, 224, 224).collect()}
    assert set(rz) == {1, 3}                        # images only
    assert bytes(rz[1]["payload"]).startswith(b"RESIZED:224x224:")
    assert rz[1]["width"] == 224 and rz[1]["height"] == 224
    assert rz[3]["payload"] is None and rz[3]["width"] is None
    fr = MM.sample_frames(df, num_frames=3).collect()
    assert len(fr) == 3                              # one video, 3 frames
    assert sorted(r["frame_no"] for r in fr) == [0, 1, 2]
    assert all(r["media_id"] == 2 for r in fr)
    assert bytes(fr[0]["frame"]).startswith(b"FRAME:")
    # deterministic: same payload -> same frames
    fr2 = MM.sample_frames(df, num_frames=3).collect()
    assert sorted(bytes(r["frame"]) for r in fr) == sorted(bytes(r["frame"]) for r in fr2)


def test_range_join_vs_brute_force(spark):
    """Bucketed range join == the inequality join it replaces."""
    import random
    from datetime import datetime, timedelta
    from tinyetl_spark.operators.ranges import range_join
    rnd = random.Random(5)
    base = datetime(2024, 1, 1)
    left = [(i, i % 7, base + timedelta(seconds=rnd.randint(0, 5000)))
            for i in range(200)]
    right = [(i % 7, base + timedelta(seconds=rnd.randint(0, 5000)),
              f"r{i}") for i in range(300)]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = spark.createDataFrame(right, "k long, rts timestamp, tag string")
    got = {(r["lid"], r["tag"]) for r in
           range_join(ldf, rdf, on=["k"], left_time="ts", right_time="rts",
                      lower_seconds=120, upper_seconds=30).collect()}
    want = set()
    for lid, lk, lts in left:
        for rk, rts, tag in right:
            if lk == rk and lts - timedelta(seconds=120) <= rts <= lts + timedelta(seconds=30):
                want.add((lid, tag))
    assert got == want and len(want) > 50


# ------------------------------------------------------- real media codecs

def test_ppm_codec_roundtrip_and_stats():
    import numpy as np
    from tinyetl_spark.operators import media_codecs as MC
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    b = MC.encode_ppm(px)
    w, h, maxval, got = MC.decode_ppm(b)
    assert (w, h, maxval) == (4, 4, 255)
    assert (got == px).all()
    # header with comments + arbitrary whitespace (spec-conformant)
    b2 = b"P6 # comment\n# another\n 4\t4 # dims\n255\n" + px.tobytes()
    assert (MC.decode_ppm(b2)[3] == px).all()
    s = MC.ppm_stats(b)
    assert s["mean_r"] == float(px[:, :, 0].mean())
    assert s["mean_b"] == float(px[:, :, 2].mean())


def test_ppm_resize_nearest_neighbor():
    import numpy as np
    from tinyetl_spark.operators import media_codecs as MC
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(4):
            px[y, x] = (y * 4 + x, 0, 255 - (y * 4 + x))
    out = MC.resize_ppm(MC.encode_ppm(px), 2, 2)
    w, h, _, rp = MC.decode_ppm(out)
    assert (w, h) == (2, 2)
    # nearest-neighbor with center sampling picks src index 1 and 3
    assert rp[0, 0, 0] == px[1, 1, 0] and rp[1, 1, 0] == px[3, 3, 0]
    up = MC.decode_ppm(MC.resize_ppm(MC.encode_ppm(px), 8, 8))[3]
    assert (up[0:2, 0:2, 0] == px[0, 0, 0]).all()   # upscale replicates


def test_wav_codec_roundtrip_and_stats():
    import numpy as np
    from tinyetl_spark.operators import media_codecs as MC
    x = (np.sin(np.arange(800) / 10.0) * 1000).astype(np.int16)
    b = MC.encode_wav(np.stack([x, -x], axis=1), rate=8000)
    ch, rate, bits, samples = MC.decode_wav(b)
    assert (ch, rate, bits) == (2, 8000, 16)
    assert samples.shape == (800, 2)
    assert (samples[:, 0] == x).all()
    s = MC.wav_stats(b)
    assert s["n_frames"] == 800 and s["peak"] == int(np.abs(x).max())
    assert abs(s["rms"] - np.sqrt((x.astype(np.float64) ** 2).mean())) < 1e-9
    # stdlib wave agrees on the header fields
    import io
    import wave
    wf = wave.open(io.BytesIO(b))
    assert (wf.getnchannels(), wf.getframerate(), wf.getnframes()) == (2, 8000, 800)


def test_builtin_decoders_drive_spark_plumbing(spark):
    """The REAL codecs run through the same mapInPandas plumbing the
    stubs exercised: features decode, resize produces true pixels."""
    import numpy as np
    from tinyetl_spark.operators import media_codecs as MC
    px = np.full((4, 4, 3), 7, dtype=np.uint8)
    ppm = MC.encode_ppm(px)
    wav = MC.encode_wav((np.arange(100) % 50).astype(np.int16))
    df = spark.createDataFrame(
        [(1, "image", bytearray(ppm)), (2, "audio", bytearray(wav))],
        "media_id long, kind string, payload binary")
    MM.register_builtin_decoders()
    try:
        feats = {r["media_id"]: r["feature"]
                 for r in MM.extract_features(MM.attach_metadata(df)).collect()}
        assert feats[1] == "ppm:4x4:mean=7.00/7.00/7.00"
        assert feats[2].startswith("wav:1ch:16000hz:100f:rms=")
        rz = MM.resize_images(df, 2, 2).collect()
        assert len(rz) == 1
        w, h, _, rp = MC.decode_ppm(bytes(rz[0]["payload"]))
        assert (w, h) == (2, 2) and (rp == 7).all()
        st = {r["media_id"]: r for r in MM.image_stats(
            df.filter("kind = 'image'")).collect()}
        assert st[1]["mean_g"] == 7.0 and st[1]["width"] == 4
        au = MM.audio_stats(df.filter("kind = 'audio'")).collect()[0]
        assert au["n_frames"] == 100 and au["channels"] == 1
    finally:
        for k in ("image", "audio", "image/resize"):
            MM.DecoderRegistry._decoders.pop(k, None)


def test_png_codec_all_filters_roundtrip():
    """Pure-stdlib PNG decode reverses every scanline filter (0-4) for
    every supported channel layout; stats and nearest-neighbor resize
    agree with the raw pixels."""
    import numpy as np
    from tinyetl_spark.operators import media_codecs as MC
    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(13, 9, ch), dtype=np.uint8)
        for f in range(5):
            w, h, c, out = MC.decode_png(MC.encode_png(px, filter_type=f))
            assert (w, h, c) == (9, 13, ch)
            assert np.array_equal(out, px), f"filter {f} ch {ch}"
    px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    b = MC.encode_png(px, filter_type=4)
    s = MC.png_stats(b)
    assert abs(s["mean_r"] - px[:, :, 0].mean()) < 1e-9
    w, h, c, out = MC.decode_png(MC.resize_png(b, 4, 4))
    assert (w, h, c) == (4, 4, 3)
    # malformed payloads fail loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        MC.decode_png(b"\x89PNGnope")
    with _pytest.raises(ValueError):
        MC.decode_png(b"P6 1 1 255 xxx")


def test_mixed_format_images_through_spark_plumbing(spark):
    """A payload column mixing PPM and PNG (the real-crawl shape) sniffs
    per row inside ONE Arrow batch: features carry the right format tag,
    resize emits each row in its own format."""
    import numpy as np
    from tinyetl_spark.operators import media_codecs as MC
    ppm = MC.encode_ppm(np.full((4, 4, 3), 7, dtype=np.uint8))
    png = MC.encode_png(np.full((6, 6, 3), 9, dtype=np.uint8),
                        filter_type=2)
    df = spark.createDataFrame(
        [(1, "image", bytearray(ppm)), (2, "image", bytearray(png))],
        "media_id long, kind string, payload binary")
    MM.register_builtin_decoders()
    try:
        feats = {r["media_id"]: r["feature"]
                 for r in MM.extract_features(MM.attach_metadata(df)).collect()}
        assert feats[1] == "ppm:4x4:mean=7.00/7.00/7.00"
        assert feats[2] == "png:6x6:mean=9.00/9.00/9.00"
        rz = {r["media_id"]: bytes(r["payload"])
              for r in MM.resize_images(df, 2, 2).collect()}
        w, h, _, rp = MC.decode_ppm(rz[1])
        assert (w, h) == (2, 2) and (rp == 7).all()
        w, h, c, gp = MC.decode_png(rz[2])
        assert (w, h, c) == (2, 2, 3) and (gp == 9).all()
    finally:
        for k in ("image", "audio", "image/resize"):
            MM.DecoderRegistry._decoders.pop(k, None)


def test_pillow_codecs_when_available(spark):
    """Optional-dependency path: with Pillow importable the registry
    swaps in Image.open-backed decoders (JPEG/WebP/... coverage); absent
    Pillow the call is a no-op returning False and the dependency-free
    codecs stay in charge."""
    import pytest as _pytest
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        assert MM.register_pillow_codecs() is False
        assert "image" not in MM.DecoderRegistry._decoders
        _pytest.skip("Pillow not installed — no-op contract verified")
    import io

    import numpy as np
    from PIL import Image
    assert MM.register_pillow_codecs() is True
    try:
        buf = io.BytesIO()
        Image.fromarray(np.full((4, 4, 3), 7, dtype=np.uint8)).save(
            buf, format="JPEG")
        df = spark.createDataFrame(
            [(1, "image", bytearray(buf.getvalue()))],
            "media_id long, kind string, payload binary")
        feats = MM.extract_features(MM.attach_metadata(df)).collect()
        assert feats[0]["feature"].startswith("jpeg:4x4:mean=")
    finally:
        for k in ("image", "image/resize"):
            MM.DecoderRegistry._decoders.pop(k, None)


def test_scd2_history_intervals_and_asof(spark):
    """SCD2: each non-delete event opens an interval, the next event of
    the key closes it, a delete closes without emitting, as_of picks the
    version valid at T."""
    from datetime import datetime

    from tinyetl_spark.operators.scd2 import as_of, scd2_history

    ts = lambda s: datetime(2025, 1, 1, 0, 0, s)
    rows = [
        (1, "u1", ts(10), "insert"),
        (2, "u1", ts(20), "update"),
        (3, "u1", ts(30), "delete"),
        (4, "u1", ts(40), "insert"),       # re-created after delete
        (5, "u2", ts(15), "insert"),
        (6, "u3", ts(5), "insert"),
        (7, "u3", ts(6), "delete"),        # ends deleted -> no current row
    ]
    df = spark.createDataFrame(
        rows, "event_seq long, url string, warc_ts timestamp, op string")
    h = scd2_history(df).select("url", "event_seq", "valid_from",
                                "valid_to", "is_current")
    got = {r["event_seq"]: (r["valid_to"], r["is_current"])
           for r in h.collect()}
    assert got == {
        1: (ts(20), False),
        2: (ts(30), False),                # closed by the delete
        4: (None, True),
        5: (None, True),
        6: (ts(6), False),                 # closed by delete, none current
    }
    # point-in-time: at t=25 u1 is version 2, u2 version 5, u3 gone
    at25 = {r["url"]: r["event_seq"] for r in as_of(h, ts(25)).collect()}
    assert at25 == {"u1": 2, "u2": 5}
    # at t=35 u1 is deleted (interval closed, next opens at 40)
    at35 = {r["url"]: r["event_seq"] for r in as_of(h, ts(35)).collect()}
    assert at35 == {"u2": 5}


def test_canonical_url(spark):
    """Scheme/host case, default ports, fragments, utm params, param
    order and empty paths all normalize; non-defaults survive."""
    from tinyetl_spark.operators.text import canonical_url
    cases = [
        ("HTTP://Example.COM:80/a?b=1#frag", "http://example.com/a?b=1"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com", "http://example.com/"),
        ("http://a.com/p?z=2&a=1&utm_source=tw&b=3", "http://a.com/p?a=1&b=3&z=2"),
        ("http://a.com/p?utm_campaign=x", "http://a.com/p"),
        ("  http://a.com/p  ", "http://a.com/p"),
        ("http://a.com/p#only-frag", "http://a.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_script_profile_detects_and_breaks_ties(spark):
    rows = [
        (0, "hello world plain ascii"),
        (1, "привет мир всем людям"),
        (2, "γειά σου κόσμε"),
        (3, "مرحبا بالعالم"),
        (4, "你好世界 こんにちは みなさん"),
        (5, "안녕하세요 세계"),
        (6, "1234 5678 ... !!!"),          # no script chars at all
        (7, "ab ыв"),                        # 2 latin vs 2 cyrillic: tie
        (8, "mixed текст with кириллица inside"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           T.script_profile(df).orderBy("doc_id").collect()}
    assert out[0]["dominant_script"] == "latin"
    assert out[1]["dominant_script"] == "cyrillic"
    assert out[2]["dominant_script"] == "greek"
    assert out[3]["dominant_script"] == "arabic"
    assert out[4]["dominant_script"] == "cjk"
    assert out[5]["dominant_script"] == "hangul"
    assert out[6]["dominant_script"] == "und"
    assert out[6]["script_chars"] == 0
    # tie breaks by SCRIPT_ORDER priority (latin first)
    assert out[7]["dominant_script"] == "latin"
    assert out[7]["latin_frac"] == out[7]["cyrillic_frac"] == 0.5
    # fractions partition script_chars (sum to ~1 when any exist)
    for i in range(6):
        s = sum(out[i][f"{name}_frac"] for name in T.SCRIPT_ORDER)
        assert abs(s - 1.0) < 1e-5, (i, s)
    # latin-dominant mixed doc still reports the cyrillic fraction
    assert out[8]["dominant_script"] == "latin"
    assert 0 < out[8]["cyrillic_frac"] < 0.5


def test_entropy_metrics_separate_quality_classes(spark):
    rows = [
        (0, "aaaaaaaaaaaaaaaa"),                       # 1 symbol: H=0
        (1, "abababababababab"),                        # 2 symbols even: H=1
        (2, "spam spam spam spam spam"),                # 1 word: word H=0
        (3, "the quick brown fox jumps over lazy dog"),  # all distinct words
        (4, ""),                                        # empty: zeros
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           T.entropy_metrics(df).orderBy("doc_id").collect()}
    assert out[0]["char_entropy"] == 0.0
    assert out[1]["char_entropy"] == 1.0
    assert out[2]["word_entropy"] == 0.0
    # 8 distinct words, uniform: H = log2(8) = 3 bits
    assert out[3]["word_entropy"] == 3.0
    assert out[3]["distinct_words"] == 8
    assert out[4]["char_entropy"] == 0.0 and out[4]["distinct_chars"] == 0
    # natural text has higher word entropy than the template page
    assert out[3]["word_entropy"] > out[2]["word_entropy"]


def test_dedup_lines_global_keeps_first_occurrence(spark):
    boiler = "home | about | contact"
    rows = [
        (1, f"{boiler}\nunique alpha line\nshared line"),
        (2, f"{boiler}\nunique beta line\nshared line"),
        (3, f"{boiler}\n\nunique gamma line"),   # empty line dropped
        (4, boiler),                             # nothing survives
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           D.dedup_lines_global(df).orderBy("doc_id").collect()}
    # doc 1 is globally first: keeps everything
    assert out[1]["text"] == rows[0][1]
    assert out[1]["n_lines_in"] == out[1]["n_lines_kept"] == 3
    # doc 2 loses the boilerplate AND the shared line
    assert out[2]["text"] == "unique beta line"
    assert (out[2]["n_lines_in"], out[2]["n_lines_kept"]) == (3, 1)
    # doc 3: empty line dropped from the count, boilerplate deduped
    assert out[3]["text"] == "unique gamma line"
    assert (out[3]["n_lines_in"], out[3]["n_lines_kept"]) == (2, 1)
    # doc 4: fully boilerplate -> empty text, still one output row
    assert out[4]["text"] == "" and out[4]["n_lines_kept"] == 0


def test_dedup_ngram_spans_removes_cross_doc_windows(spark):
    slogan = "the quick brown fox jumps over"      # 6 tokens, k=6 below
    rows = [
        (1, f"a1 a2 a3 {slogan} b1 b2"),
        (2, f"c1 {slogan}  c2 c3 c4"),             # double space normalizes
        (3, "d1 d2 d3 d4 d5 d6 d7 d8"),            # all-unique: untouched
        (4, f"{slogan} then {slogan}"),            # both occurrences removed
        (5, "short doc"),                          # shorter than k
        (6, ""),                                   # empty text
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           D.dedup_ngram_spans(df, k=6).orderBy("doc_id").collect()}
    # span removal hits EVERY occurrence in EVERY doc (not keep-first)
    assert out[1]["text"] == "a1 a2 a3 b1 b2"
    assert (out[1]["n_tokens_in"], out[1]["n_tokens_kept"]) == (11, 5)
    assert out[2]["text"] == "c1 c2 c3 c4"
    assert (out[2]["n_tokens_in"], out[2]["n_tokens_kept"]) == (10, 4)
    # no cross-doc duplicated window -> byte-identical passthrough
    assert out[3]["text"] == rows[2][1]
    assert out[3]["n_tokens_in"] == out[3]["n_tokens_kept"] == 8
    # doc 4: both slogan copies go; "then" survives only if no duplicated
    # window covers it — the windows spanning "... over then the ..." are
    # unique to doc 4, so it survives
    assert out[4]["text"] == "then"
    assert (out[4]["n_tokens_in"], out[4]["n_tokens_kept"]) == (13, 1)
    # shorter than k / empty: untouched, zero-safe
    assert out[5]["text"] == "short doc" and out[5]["n_tokens_kept"] == 2
    assert out[6]["text"] == "" and out[6]["n_tokens_in"] == 0
    # within-doc-only repeats do not trigger removal (min_docs=2)
    solo = spark.createDataFrame(
        [(1, "x1 x2 x3 x1 x2 x3 x1 x2 x3"), (2, "y1 y2 y3 y4")],
        ["doc_id", "text"])
    kept = {r["doc_id"]: r["text"] for r in
            D.dedup_ngram_spans(solo, k=3).collect()}
    assert kept[1] == "x1 x2 x3 x1 x2 x3 x1 x2 x3"
    assert kept[2] == "y1 y2 y3 y4"


def test_dedup_ngram_spans_incremental_matches_global_pass(spark):
    """The incremental pass over (batch, corpus-index) must equal the
    GLOBAL pass over corpus ∪ batch restricted to batch docs — the
    exactness claim in its docstring — including a window that is
    unique within the batch but already known to the corpus."""
    corpus_rows = [
        (1, "alpha beta gamma delta epsilon zeta own tail one"),
        (2, "totally different corpus content with no overlap at all"),
    ]
    batch_rows = [
        # repeats corpus doc 1's opening 6-gram (corpus hit, batch-unique)
        (10, "alpha beta gamma delta epsilon zeta new stuff here"),
        # shares a 6-gram with doc 11 only (batch-internal duplicate)
        (11, "p1 p2 shared span of six tokens here q1"),
        (12, "r1 shared span of six tokens here r2 r3"),
        (13, "nothing duplicated anywhere in this one at all"),
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])
    idx = D.build_ngram_span_index(corpus, k=6)
    inc = {r["doc_id"]: r for r in
           D.dedup_ngram_spans_incremental(batch, idx, k=6).collect()}
    glob = {r["doc_id"]: r for r in
            D.dedup_ngram_spans(corpus.unionByName(batch), k=6).collect()
            if r["doc_id"] >= 10}
    assert set(inc) == set(glob)
    for d in inc:
        assert inc[d]["text"] == glob[d]["text"], d
        assert inc[d]["n_tokens_kept"] == glob[d]["n_tokens_kept"], d
    # sanity on the semantics themselves
    assert inc[10]["text"] == "new stuff here"     # corpus-known span gone
    assert "shared span of six tokens here" not in inc[11]["text"]
    assert inc[13]["text"] == batch_rows[3][1]     # untouched
    # index maintenance: union + re-aggregate keeps ndocs exact
    idx2 = (idx.unionByName(D.build_ngram_span_index(batch, k=6))
               .groupBy("h").agg(F.sum("ndocs").alias("ndocs")))
    merged = D.build_ngram_span_index(
        corpus.unionByName(batch), k=6)
    a = {r["h"]: r["ndocs"] for r in idx2.collect()}
    b = {r["h"]: r["ndocs"] for r in merged.collect()}
    assert a == b


def test_bm25_matches_hand_computation_and_plan_shape(spark):
    import math

    from tinyetl_spark.operators import ranking as RK

    rows = [
        (0, "spark merge merge merge lake"),        # tf(merge)=3, dl=5
        (1, "merge once in a longer document with many other words"),
        (2, "no relevant terms at all here"),
        (3, "dup dup"),                              # rare term, short doc
        (4, ""),                                     # empty doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           RK.bm25(df, ["dup", "merge"]).collect()}

    # term frequencies and doc lengths
    assert (out[0]["tf_merge"], out[0]["dl"]) == (3, 5)
    assert (out[3]["tf_dup"], out[3]["dl"]) == (2, 2)
    assert out[4]["dl"] == 0 and out[4]["bm25"] == 0.0
    assert out[2]["bm25"] == 0.0

    # hand-computed BM25 (k1=1.2, b=0.75, Lucene +1 idf) for doc 0
    n, avgdl = 5, (5 + 10 + 6 + 2 + 0) / 5.0
    idf_merge = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    tf, dl = 3.0, 5
    expect = idf_merge * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert out[0]["bm25"] == pytest.approx(expect, abs=1e-6)

    # rare term outranks common term at similar tf/dl
    assert out[3]["bm25"] > out[0]["bm25"]

    # top-k: ordered desc, deterministic doc_id tiebreak, limited
    top = RK.bm25(df, ["dup", "merge"], top_k=2).collect()
    assert [r["doc_id"] for r in top] == [3, 0]

    # plan shape: no explode/generate, single-row stats side broadcast
    plan = RK.bm25(df, ["dup", "merge"], top_k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_lm_score_hand_computation_oov_and_empty(spark):
    import math

    from tinyetl_spark.operators import ranking as RK

    rows = [
        (0, "spark spark merge"),
        (1, "spark weird"),      # 'weird' OOV at vocab_k=2
        (2, ""),                 # empty doc -> (0, 0.0, 0.0)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in RK.lm_score(df, vocab_k=2).collect()}

    # corpus: spark=3, merge=1, weird=1 -> vocab(2) = {spark, merge}
    # (count desc, token asc: merge beats weird on the tie at c=1)
    t, v = 5, 2

    def s(c):
        return round(-math.log((c + 1) / (t + v + 1)) * 10_000)

    exp0 = round((2 * s(3) + s(1)) / 10_000 / 3, 6)
    exp1 = round((s(3) + s(0)) / 10_000 / 2, 6)
    assert out[0]["mean_nll"] == pytest.approx(exp0, abs=1e-9)
    assert out[1]["mean_nll"] == pytest.approx(exp1, abs=1e-9)
    assert out[0]["oov_frac"] == 0.0
    assert out[1]["oov_frac"] == 0.5
    assert (out[2]["dl"], out[2]["mean_nll"], out[2]["oov_frac"]) == (0, 0.0, 0.0)
    # OOV-heavy doc scores strictly worse (higher surprisal)
    assert out[1]["mean_nll"] > out[0]["mean_nll"]

    # plan shape: LM side is broadcast, doc agg is partial-aggregated
    plan = RK.lm_score(df, vocab_k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_webmeta_extraction_and_anchor_aggregation(spark):
    from tinyetl_spark.operators import webmeta as WM

    html1 = ("<html><head><TITLE> My Page </TITLE>"
             "<meta name='description' content='a fine page'>"
             "<link rel=\"canonical\" href=\"HTTP://EX.org:80/a?utm_x=1&b=2#f\">"
             "<meta property='article:published_time' content='2026-03-01T08:30:00'>"
             "</head><body>"
             "<a href=\"https://ex.org/b\" class=\"z\">Read  More</a>"
             "<A href='https://ex.org/c'>Home</A>"
             "<a href='https://ex.org/a'>self</a>"   # self-link
             "</body></html>")
    html2 = "<html><head></head><body><a href='https://ex.org/b'>read more</a></body></html>"
    rows = [("https://ex.org/a", bytearray(html1, "utf-8")),   # binary html
            ("https://ex.org/d", bytearray(html2, "utf-8"))]
    df = spark.createDataFrame(rows, "url: string, html: binary")

    meta = {r["url"]: r for r in WM.page_metadata(df).collect()}
    m = meta["https://ex.org/a"]
    assert m["title"] == "My Page"
    assert m["meta_desc"] == "a fine page"
    assert m["canonical"] == "http://ex.org/a?b=2"   # port+utm+fragment gone
    assert str(m["published_time"]) == "2026-03-01 08:30:00"
    m2 = meta["https://ex.org/d"]
    assert (m2["title"], m2["meta_desc"], m2["canonical"]) == ("", "", "")
    assert m2["published_time"] is None

    edges = WM.anchor_edges(df).collect()
    got = {(r["src"], r["dst"], r["anchor"]) for r in edges}
    assert got == {
        ("https://ex.org/a", "https://ex.org/b", "read more"),
        ("https://ex.org/a", "https://ex.org/c", "home"),
        ("https://ex.org/d", "https://ex.org/b", "read more"),
    }  # self-link dropped; anchor text normalized; zip stays aligned

    top = WM.top_anchors(WM.anchor_edges(df), k=1).collect()
    by_dst = {r["dst"]: r for r in top}
    assert by_dst["https://ex.org/b"]["n_links"] == 2
    assert by_dst["https://ex.org/b"]["anchor"] == "read more"
    assert by_dst["https://ex.org/c"]["rank"] == 1


def test_dedup_ngram_spans_property_vs_python_reference(spark):
    """Property check (hypothesis): random small corpora over a tiny
    vocabulary (to force cross-doc window collisions) match a brute-force
    pure-Python implementation of the window/cover rule token-for-token,
    and the incremental pass over a random corpus/batch split matches the
    global pass restricted to the batch. One Spark job per example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def py_reference(docs, k):
        toks = {i: t.split() for i, t in docs.items()}
        owners = {}
        for i, ts in toks.items():
            for p in range(len(ts) - k + 1):
                owners.setdefault(tuple(ts[p:p + k]), set()).add(i)
        out = {}
        for i, ts in toks.items():
            cov = set()
            for p in range(len(ts) - k + 1):
                if len(owners[tuple(ts[p:p + k])]) >= 2:
                    cov.update(range(p, p + k))
            kept = [t for j, t in enumerate(ts) if j not in cov]
            out[i] = (" ".join(kept), len(ts), len(kept))
        return out

    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=st.lists(doc, min_size=2, max_size=6),
           k=st.integers(2, 4), split=st.integers(1, 5))
    def run(texts, k, split):
        docs = dict(enumerate(texts))
        df = spark.createDataFrame(list(docs.items()),
                                   "doc_id int, text string")
        got = {r["doc_id"]: (r["text"], r["n_tokens_in"], r["n_tokens_kept"])
               for r in D.dedup_ngram_spans(df, k=k).collect()}
        assert got == py_reference(docs, k)
        corpus = df.filter(F.col("doc_id") < split)
        batch = df.filter(F.col("doc_id") >= split)
        if batch.count() and corpus.count():
            idx = D.build_ngram_span_index(corpus, k=k)
            inc = {r["doc_id"]: r["text"] for r in
                   D.dedup_ngram_spans_incremental(batch, idx, k=k)
                    .collect()}
            assert inc == {i: got[i][0] for i in docs if i >= split}

    run()
