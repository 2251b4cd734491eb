"""Dedup scale-path semantics (round 2): pigeonhole SimHash recall and
LSH bucket caps."""

from pyspark.sql import functions as F

from typhoon_ocr_spark.functions.textsql import SIMHASH_BITS
from typhoon_ocr_spark.operators.dedup import (
    minhash_candidate_pairs,
    simhash_pairs_from_fingerprints,
)


def _fp(bits: str) -> str:
    assert len(bits) == SIMHASH_BITS
    return bits


def test_pigeonhole_finds_pairs_prefix_blocking_missed(spark):
    """A pair differing only in the LEADING bits was invisible to the
    round-1 prefix-8 blocking; pigeonhole segments must find it."""
    rows = [
        ("a", _fp("0000000000000000")),
        ("b", _fp("1100000000000000")),  # hamming 2, both in bits 1-2
        ("c", _fp("0000000000000011")),  # hamming 2 vs a, trailing bits
        ("d", _fp("1111111100000000")),  # hamming 8 vs a — not a dup
    ]
    sh = spark.createDataFrame(rows, "doc_id string, simhash string")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs_from_fingerprints(sh).collect()
    }
    assert ("a", "b", 2) in got  # leading-bit pair: the regression case
    assert ("a", "c", 2) in got
    assert ("b", "c", 4) not in got
    assert all(h <= 2 for _, _, h in got)


def test_pigeonhole_full_recall_exhaustive(spark):
    """Every hamming<=2 pair over a random cohort is found (pigeonhole
    guarantees it; prefix blocking provably can't)."""
    import itertools
    import random

    rng = random.Random(7)
    base = rng.getrandbits(SIMHASH_BITS)
    fps = []
    for i in range(40):
        v = base
        for _ in range(rng.randrange(0, 4)):  # 0-3 bit flips
            v ^= 1 << rng.randrange(SIMHASH_BITS)
        fps.append((f"d{i:02d}", format(v, f"0{SIMHASH_BITS}b")))
    expected = {
        (a, b, bin(int(fa, 2) ^ int(fb, 2)).count("1"))
        for (a, fa), (b, fb) in itertools.combinations(fps, 2)
        if bin(int(fa, 2) ^ int(fb, 2)).count("1") <= 2
    }
    sh = spark.createDataFrame(fps, "doc_id string, simhash string")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs_from_fingerprints(sh).collect()
    }
    assert got == expected


def test_simhash_bucket_cap_drops_degenerate_buckets(spark):
    """An identical-fingerprint flood larger than max_bucket is dropped
    before the quadratic fan-out (one dup-cluster, not N^2 pairs)."""
    flood = [(f"f{i:03d}", _fp("1010101010101010")) for i in range(30)]
    pair = [("x", _fp("0101010101010101")), ("y", _fp("0101010101010111"))]
    sh = spark.createDataFrame(flood + pair, "doc_id string, simhash string")
    got = simhash_pairs_from_fingerprints(sh, max_bucket=10).collect()
    ids = {(r["doc_a"], r["doc_b"]) for r in got}
    assert ("x", "y") in ids
    assert not any(a.startswith("f") for a, _ in ids)


def test_minhash_bucket_cap(spark):
    """A duplicate-text flood above the cap produces no candidate pairs
    (the cluster is findable by exact dedup; LSH skips the N^2 blowup),
    while a small dup group below the cap still pairs up."""
    flood_text = "the quick brown fox jumps over the lazy dog again and again"
    small_text = "completely different words describing another subject matter entirely"
    rows = [(f"f{i:03d}", flood_text) for i in range(12)]
    rows += [("s1", small_text), ("s2", small_text)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(docs, max_bucket=8).collect()
    }
    assert ("s1", "s2") in pairs
    assert not any(a.startswith("f") for a, _ in pairs)


def test_minhash_pairs_plan_single_exchange_for_window_and_group(spark):
    """The cap's window count and the bucket groupBy share one exchange
    on (band, band_hash) — the cap must not add a second shuffle."""
    docs = spark.createDataFrame(
        [(f"d{i}", f"words shared prefix tail {i % 3} more body text here") for i in range(20)],
        "doc_id string, text string",
    )
    plan = minhash_candidate_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    # exchanges: one for the doc_id signature agg, one for (band,
    # band_hash), one for the final distinct — the window adds none
    assert plan.count("Exchange hashpartitioning") <= 3


def test_jaccard_pairs_single_shingle_lineage(spark):
    """jaccard_pairs must tokenize+shingle the corpus exactly once: the
    candidate pipeline and both verification join sides all read the
    persisted shingle frame (round-2 verdict: the old shape recomputed
    the minhash pipeline AND shingled both join sides — three scans of
    the corpus at 100 TB)."""
    from typhoon_ocr_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"words shared prefix tail {i % 3} more body text here") for i in range(30)],
        "doc_id long, text string",
    )
    jp = jaccard_pairs(docs)
    plan = jp._jdf.queryExecution().executedPlan().toString()
    # three consumers (pairs lineage + join sides a/b), all cache reads
    assert plan.count("InMemoryTableScan") == 3
    got = {(r["doc_a"], r["doc_b"], r["jaccard_pct"]) for r in jp.collect()}
    # identical-text cohort pairs verify at exactly 100; any cross-
    # cohort LSH candidate must verify strictly below
    assert (0, 3, 100) in got
    assert all((pct == 100) == (a % 3 == b % 3) for a, b, pct in got)


def test_sampling_rate_one_keeps_everything(spark):
    from typhoon_ocr_spark.operators.sampling import (
        deterministic_sample,
        hex_threshold,
        stratified_sample,
    )

    assert hex_threshold(1.0) == "g"  # above every hex string
    docs = spark.createDataFrame(
        [(i, "th" if i % 2 else "en") for i in range(400)], "doc_id long, lang string"
    )
    assert deterministic_sample(docs, 1.0).count() == 400
    kept = stratified_sample(docs, rates={"th": 1.0, "en": 0.0}).collect()
    assert len(kept) == 200 and all(r["lang"] == "th" for r in kept)


def test_connected_components_semantics(spark):
    """Chain, triangle-plus-tail, and disjoint pair resolve to min-id
    components with correct sizes; convergence needs diameter rounds."""
    from typhoon_ocr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain: component 1, size 4
            (10, 11), (11, 12), (10, 12), (12, 13),  # dense + tail: comp 10, size 4
            (20, 21),                        # pair: comp 20, size 2
        ],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in connected_components(pairs).collect()}
    assert got == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 4), 11: (10, 4), 12: (10, 4), 13: (10, 4),
        20: (20, 2), 21: (20, 2),
    }


def test_connected_components_matches_pair_transitive_closure(spark):
    """Against the corpus simhash pairs: every pair's two docs share a
    cluster, and cluster ids are the min member."""
    from typhoon_ocr_spark.operators.dedup import (
        connected_components,
        simhash_near_dups,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = simhash_near_dups(docs)
    comp = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs).collect()}
    for a, b, _h in pairs.collect():
        assert comp[a] == comp[b]
    assert all(cid <= d for d, cid in comp.items())
    assert any(cid < d for d, cid in comp.items())  # non-trivial clusters


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 40-node path has diameter 39 — plain 1-hop propagation would
    need 39 rounds; pointer jumping must converge inside max_iter=15
    (O(log diameter))."""
    from typhoon_ocr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 140)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in connected_components(pairs, max_iter=15).collect()}
    assert got == {i: (100, 41) for i in range(100, 141)}


def test_arrow_pass_degenerate_doc_semantics(spark):
    """r6 focused pins for the vectorized Arrow passes: the degenerate
    documents the corpus oracle never exercises must keep the exact
    semantics of the JVM expressions they replaced."""
    from typhoon_ocr_spark.operators.dedup import (
        minhash_bands,
        simhash_fingerprints,
    )
    from typhoon_ocr_spark.operators.textstats import top_bigram

    docs = spark.createDataFrame(
        [
            (1, "one two three four"),        # normal
            (2, ""),                          # empty text
            (3, "!!! ??? ..."),               # tokens all empty after split
            (4, "solo"),                      # 1 token: no bigram, no bands
            (5, None),                        # null text
            (6, "a b"),                       # 2 tokens: bigram, no shingle
        ],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: (r["simhash"], r["n_tokens"])
          for r in simhash_fingerprints(docs).collect()}
    # empty/zero-token docs: the empty-fold value is all-'1', count 0
    assert sh[2] == ("1" * 16, 0) and sh[3] == ("1" * 16, 0)
    # null text keeps its old row: CASE WHEN null>=0 → '0', size(null) → null
    assert sh[5] == ("0" * 16, None)
    assert sh[1][1] == 4

    bands = {r["doc_id"] for r in minhash_bands(docs).collect()}
    assert bands == {1}  # only the >=3-token doc shingles

    bg = {r["doc_id"]: (r["bigram"], r["occurrences"], r["top_per_mille"])
          for r in top_bigram(docs).collect()}
    assert set(bg) == {1, 6}  # <2-token and null docs are omitted
    assert bg[6] == ("a b", 1, 1000)
    assert bg[1][0] == "one two"
