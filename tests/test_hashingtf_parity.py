"""HashingTF murmur3 parity pins (SURVEY §7 handoff note b, VERDICT r7 item 4).

Pins, in one place:
1. the pure-Python reference == the REAL ``pyspark.ml.feature.HashingTF``
   on adversarial + seeded-random terms (incl. every tail length and
   multi-byte UTF-8);
2. the native Spark column rendering == the reference;
3. the DuckDB nested-subquery rendering == the reference;
4. the documented divergence from ``F.hash`` (lenient tail) — they agree
   exactly on 4-byte-aligned terms and differ on some unaligned ones;
5. the catalog operator reproduces real ``HashingTF.transform`` vectors;
6. the oversize-token guard fails loudly instead of truncating.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.functions import (  # noqa: E501
    hashing as H,
)

ADVERSARIAL = [
    "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg", "abcdefgh",
    "hello world", "héllo", "naïve", "日本語", "ü", "€", "𝄞",
    "x" * 31, "x" * 32, "credit_report", "Mortgage", "Debt collection",
    "tail1", "tl22", "tai333", "0", " ", "  ", "\t", "xxxx",
]


def _random_terms(n=300, seed=8):
    rng = random.Random(seed)
    pools = [
        lambda: chr(rng.randrange(0x21, 0x7F)),          # ascii
        lambda: chr(rng.randrange(0xA1, 0x2FF)),         # 2-byte utf8
        lambda: chr(rng.randrange(0x4E00, 0x9FFF)),      # 3-byte utf8
        lambda: chr(rng.randrange(0x1D100, 0x1D1FF)),    # 4-byte utf8
    ]
    out = []
    for _ in range(n):
        term = "".join(rng.choice(pools)() for _ in range(rng.randrange(1, 12)))
        if len(term.encode("utf-8")) <= 32:
            out.append(term)
    return out


def test_python_reference_matches_real_hashingtf(spark):
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(numFeatures=1 << 18)
    for term in ADVERSARIAL + _random_terms():
        assert H.hashingtf_index_py(term, 1 << 18) == tf.indexOf(term), repr(term)


def test_spark_rendering_matches_reference(spark):
    terms = ADVERSARIAL + _random_terms()
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    out = H.with_hashingtf_index(
        H.with_murmur3(df, "term", "h"), "term", "ix", 1024
    ).collect()
    assert len(out) == len(terms)
    for r in out:
        assert r.h == H.murmur3_py(r.term.encode("utf-8")), repr(r.term)
        assert r.ix == H.hashingtf_index_py(r.term, 1024), repr(r.term)


def test_duckdb_rendering_matches_reference():
    import duckdb

    con = duckdb.connect()
    terms = ADVERSARIAL + _random_terms()
    con.execute("create table t(term varchar)")
    con.executemany("insert into t values (?)", [(t,) for t in terms])
    sub = H.murmur3_duckdb_subquery("select term from t", ["term"], "term", "h")
    for term, h in con.execute(f"select term, h from {sub} q").fetchall():
        assert h == H.murmur3_py(term.encode("utf-8")), repr(term)
    sub2 = H.hashingtf_index_duckdb_subquery(
        "select term from t", ["term"], "term", "ix", 1024
    )
    for term, ix in con.execute(f"select term, ix from {sub2} q").fetchall():
        assert ix == H.hashingtf_index_py(term, 1024), repr(term)


def test_divergence_from_f_hash_is_as_documented(spark):
    """F.hash (hashUnsafeBytes) == standard murmur3 (hashUnsafeBytes2)
    exactly when octet_length % 4 == 0; they differ for SOME unaligned
    terms (that difference is why functions/hashing.py exists)."""
    terms = ADVERSARIAL + _random_terms()
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = H.with_murmur3(df, "term", "std").withColumn("lenient", F.hash("term")).collect()
    n_diff_unaligned = 0
    for r in rows:
        nbytes = len(r.term.encode("utf-8"))
        if nbytes % 4 == 0:
            assert r.std == r.lenient, f"aligned term diverged: {r.term!r}"
        elif r.std != r.lenient:
            n_diff_unaligned += 1
    assert n_diff_unaligned > 0, "expected at least one unaligned divergence"


def test_operator_reproduces_real_hashingtf_vectors(spark):
    """hashed_term_features' (index, tf) must equal HashingTF.transform
    run on the same tokenized docs."""
    from pyspark.ml.feature import HashingTF

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
        (2, "mortgage mortgage debt collection credit report"),
        (3, "héllo naïve 日本語 tokens everywhere"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    ours = {
        r.feature_ix: (r.n_docs, r.n_tokens)
        for r in __import__(
            "consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators.text",
            fromlist=["text"],
        ).hashed_term_features(df, num_features=64).collect()
    }

    toks = df.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("words"))
    tf = HashingTF(numFeatures=64, inputCol="words", outputCol="vec")
    want_docs: dict[int, set] = {}
    want_tf: dict[int, float] = {}
    for row in tf.transform(toks).collect():
        for ix, v in zip(row.vec.indices, row.vec.values):
            want_docs.setdefault(int(ix), set()).add(row.doc_id)
            want_tf[int(ix)] = want_tf.get(int(ix), 0.0) + v
    want = {ix: (len(d), int(want_tf[ix])) for ix, d in want_docs.items()}
    assert ours == want


def test_oversize_token_fails_loudly(spark):
    df = spark.createDataFrame([("y" * 33,)], "term string")
    with pytest.raises(Exception, match="max_bytes"):
        H.with_murmur3(df, "term", "h").collect()


def test_null_terms_hash_to_null_on_both_engines(spark):
    """NULL input: the guard must NOT fire (no bogus max_bytes error) and
    both renderings yield NULL (r8 review finding)."""
    import duckdb

    df = spark.createDataFrame([("abc",), (None,)], "term string")
    rows = {r.term: r.h for r in H.with_murmur3(df, "term", "h").collect()}
    assert rows["abc"] == H.murmur3_py(b"abc")
    assert rows[None] is None

    con = duckdb.connect()
    con.execute("create table t(term varchar)")
    con.execute("insert into t values ('abc'), (NULL)")
    sub = H.murmur3_duckdb_subquery("select term from t", ["term"], "term", "h")
    got = dict(con.execute(f"select term, h from {sub} q").fetchall())
    assert got["abc"] == H.murmur3_py(b"abc")
    assert got[None] is None


def test_hash_plan_stays_compact(spark):
    """Regression pin for the r11 HOF rewrite: the Spark murmur3 program
    must stay a SHORT step list (the unrolled form emitted ~100 lateral
    aliases -> a ~255 KB whole-stage-codegen unit costing ~3 s of Janino
    compile per query).  Step count is the structural invariant: each
    step becomes one nested Project level, and the generated code size
    scales with it."""
    steps, _final = H._murmur3_hof_steps("term", "__m3_t", 32)
    assert len(steps) < 20, len(steps)
    # and the plan built from it carries the same bound of Projects
    df = spark.createDataFrame([("hello",), ("worlds",)], "term string")
    plan = (
        H.with_murmur3(df, "term", "h")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Project") < 25, plan.count("Project")
