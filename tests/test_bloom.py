"""Bloom-filter membership sketch (sketches.bloom_build / bloom_probe)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.sketches import bloom_build, bloom_probe


def _vals(spark, items):
    return spark.createDataFrame([(i, v) for i, v in enumerate(items)], "id long, v string")


def test_bloom_no_false_negatives(spark):
    members = _vals(spark, [f"url{i}" for i in range(200)])
    bloom = bloom_build(members, "v", m_bits=1 << 14, k=4)
    probed = {r["id"]: r["maybe_seen"] for r in
              bloom_probe(members, "v", bloom, "id", m_bits=1 << 14, k=4).collect()}
    assert all(v == 1 for v in probed.values())  # Bloom's hard guarantee


def test_bloom_rejects_most_non_members(spark):
    members = _vals(spark, [f"url{i}" for i in range(200)])
    bloom = bloom_build(members, "v", m_bits=1 << 14, k=4)
    others = _vals(spark, [f"other{i}" for i in range(200)])
    seen = sum(r["maybe_seen"] for r in
               bloom_probe(others, "v", bloom, "id", m_bits=1 << 14, k=4).collect())
    # 200·4 bits in 16384 → p ≈ (1-e^{-800/16384})^4 ≈ 5e-6; deterministic
    assert seen <= 2


def test_bloom_deterministic_across_partitioning(spark):
    members = _vals(spark, [f"u{i}" for i in range(100)])
    b1 = {(r["blk"], r["bits"]) for r in bloom_build(members, "v", 1 << 12, 3).collect()}
    b2 = {(r["blk"], r["bits"]) for r in
          bloom_build(members.repartition(7), "v", 1 << 12, 3).collect()}
    assert b1 == b2
    # duplicates in the input change nothing (set semantics via distinct)
    b3 = {(r["blk"], r["bits"]) for r in
          bloom_build(members.unionByName(members), "v", 1 << 12, 3).collect()}
    assert b3 == b1


def test_bloom_masks_are_nonnegative_32bit(spark):
    members = _vals(spark, [f"u{i}" for i in range(64)])
    for _blk, bits in ((r["blk"], r["bits"]) for r in
                       bloom_build(members, "v", 1 << 10, 4).collect()):
        assert 0 < bits < (1 << 32)  # 32-bit blocks: no sign-bit edge cases
