"""Multimodal-column plumbing: schema, Arrow batch shape, deterministic
stubbed decode, metadata pruning (SURVEY extension surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (
    multimodal as MM,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return MM.media_table(docs).cache()


def test_media_table_schema(media):
    d = dict(media.dtypes)
    assert d["content"] == "binary"
    assert d["modality"] == "string"
    assert d["meta"].startswith("struct<image:struct<width:int")


def test_modality_discriminator_exclusive(media):
    # exactly the matching meta branch is non-null per row
    bad = media.filter(
        ((F.col("modality") == "image") & F.col("meta.image").isNull())
        | ((F.col("modality") == "audio") & F.col("meta.audio").isNull())
        | ((F.col("modality") == "video") & F.col("meta.video").isNull())
        | ((F.col("modality") != "image") & F.col("meta.image").isNotNull())
    ).count()
    assert bad == 0


def test_content_bytes_match_text(media, spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    joined = media.join(docs, media.media_id == docs.doc_id).filter(
        F.octet_length("content") != F.octet_length(F.encode("text", "UTF-8"))
    )
    assert joined.count() == 0


def test_decode_features_deterministic(media):
    a = {r.media_id: (r.n_bytes, r.byte_mean, r.byte_mod_sum)
         for r in MM.decode_features(media).collect()}
    b = {r.media_id: (r.n_bytes, r.byte_mean, r.byte_mod_sum)
         for r in MM.decode_features(media.repartition(7)).collect()}
    assert a == b  # partitioning-invariant (Arrow batches don't leak state)
    assert len(a) == media.count()


def test_decode_features_values(media):
    row = media.filter(F.col("media_id") == 0).select("content").first()
    blob = bytes(row.content)
    feat = (
        MM.decode_features(media)
        .filter(F.col("media_id") == 0)
        .first()
    )
    assert feat.n_bytes == len(blob)
    assert feat.byte_mean == round(sum(blob) / len(blob), 6)
    assert feat.byte_mod_sum == sum(blob) % 997


def test_decode_strict_raises_without_codec(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("codec present; strict path would decode for real")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        MM.decode_features(media.limit(2), strict=True).collect()


def test_resize_shape_contract(media):
    out = MM.resize_images(media, width=8, height=8)
    rows = out.limit(5).collect()
    assert rows, "image modality rows exist"
    for r in rows:
        assert r.out_width == 8 and r.out_height == 8
        assert len(r.pixels) == 64
        assert all(0.0 <= p <= 1.0 for p in r.pixels)


def test_frame_sample_bounds(media):
    fs = MM.frame_index_sample(media, every_n=8)
    joined = fs.join(
        media.select("media_id", F.col("meta.video.n_frames").alias("nf")),
        "media_id",
    )
    assert joined.filter(
        (F.col("frame_idx") < 0)
        | (F.col("frame_idx") >= F.col("nf"))
        | (F.col("frame_idx") % 8 != 0)
    ).count() == 0


def test_frame_sample_prunes_binary_column(media, spark):
    # the cached `media` fixture would otherwise be substituted for the
    # identical fresh plan (cache-manager plan matching), hiding pruning
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = MM.frame_index_sample(
        MM.media_table(docs), every_n=8
    )._jdf.queryExecution().optimizedPlan().toString()
    # column pruning: the blob bytes must not appear in the scan for a
    # metadata-only query (load-bearing at 100 TB — blobs dominate bytes)
    assert "encode(text" not in plan


def test_connected_components_transitive(spark):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (
        dedup as DD,
    )

    # chain 1-2-3 (transitive), pair 10-11, pair crossing via 3-10 absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {(r.doc_id, r.component) for r in DD.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_canonical_docs_keeps_min_and_untouched(spark):
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (
        dedup as DD,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    comps = DD.connected_components(pairs)
    kept = {r.doc_id for r in DD.canonical_docs(docs, comps).collect()}
    assert kept == {1, 10, 99}  # cluster reps + the doc in no pair


def test_canonical_docs_non_broadcast_path(spark):
    """VERDICT r2 item 2: above the loser-count threshold (or with the
    threshold disabled) canonical_docs must emit an UNHINTED anti-join —
    same answer, join strategy left to AQE instead of a forced broadcast
    that would OOM on a high-dup crawl."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark.operators import (
        dedup as DD,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    comps = DD.connected_components(pairs)

    for thresh in (0, None):  # 0 = loser count exceeds it; None = AQE always
        out = DD.canonical_docs(docs, comps, max_broadcast_losers=thresh)
        logical = out._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in logical
        assert {r.doc_id for r in out.collect()} == {1, 10, 99}

    # under the threshold the hint IS applied (the corpus must not shuffle)
    hinted = DD.canonical_docs(docs, comps, max_broadcast_losers=10)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
