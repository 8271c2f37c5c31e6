"""EP-1 pipeline restatement: sources → normalize → score → parquet."""

from __future__ import annotations

import tempfile

from rick_and_morty_data_pipeline_project_spark.sources.restapi_datasource import (
    register,
)
from rick_and_morty_data_pipeline_project_spark.sources.scraper import (
    etl_pipeline,
    fake_episode_api,
    idempotent_append,
)


def test_etl_pipeline_end_to_end(spark):
    with tempfile.TemporaryDirectory() as out:
        tables = etl_pipeline(spark, out)
        assert tables["emotion_dim"].count() == 6
        assert tables["episode_dim"].count() == 41
        assert tables["episode_emotion"].count() == 41
        assert tables["strain_review"].count() == 278

        # scores are valid distributions over tokens
        row = tables["episode_emotion"].first()
        emos = [row[e] for e in ("happy", "angry", "bored", "fear", "sad", "excited")]
        assert abs(sum(emos) - 1.0) < 1e-9  # vocab fully covered by lexicon

        # normalization: ':' stripped except ids 19/25/32/35; ',' always
        slugs = {
            r["episode_id"]: r["episode_slug"]
            for r in tables["episode_dim"].collect()
        }
        for eid, slug in slugs.items():
            assert "," not in slug
            if eid not in (19, 25, 32, 35):
                assert ":" not in slug

        # full refresh (MUT-2): re-run overwrites, same results
        tables2 = etl_pipeline(spark, out)
        assert tables2["strain_review"].count() == 278


def test_idempotent_append(spark):
    existing = fake_episode_api(spark, n=30)
    everything = fake_episode_api(spark, n=41)
    delta = idempotent_append(existing, everything, "episode_id")
    assert delta.count() == 11
    # re-applying after merge yields empty delta (JOIN-4 idempotency)
    merged = existing.unionByName(delta)
    assert idempotent_append(merged, everything, "episode_id").count() == 0


def test_python_datasource_partitioned_read(spark):
    register(spark)
    df = spark.read.format("episode_api").option("numPartitions", "4").load()
    assert df.rdd.getNumPartitions() >= 4
    rows = df.collect()
    assert len(rows) == 41
    assert {r["episode_id"] for r in rows} == set(range(1, 42))
