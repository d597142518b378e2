"""Multimodal pipeline tests: oracle parity, fan-out shape, and the scale
property that metadata-only stages never read the payload column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import assert_oracle_match
from json_format_in_parquet_benchmark_spark.operators.multimodal import (
    FRAME_SAMPLE_K,
    media_table,
    resize_images,
)
from json_format_in_parquet_benchmark_spark.plans import REGISTRY
from json_format_in_parquet_benchmark_spark.tables import load_table


@pytest.mark.parametrize(
    "name",
    [
        "multimodal_catalog",
        "multimodal_decode_features",
        "multimodal_image_resize",
        "multimodal_video_frame_sample",
    ],
)
def test_multimodal_queries_match_oracle(spark, duck, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert_oracle_match(df, duck.sql(REGISTRY[name].oracle), name)


def test_media_payload_is_binary_with_typed_meta(spark, sf_dir):
    m = media_table(load_table(spark, sf_dir, "documents"))
    dt = dict(m.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<")
    kinds = {r.kind for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_frame_sample_fanout_is_k_per_video(spark, sf_dir):
    out = REGISTRY["multimodal_video_frame_sample"].fn(spark, sf_dir)
    per_video = out.groupBy("media_id").count().collect()
    assert per_video and all(r["count"] == FRAME_SAMPLE_K for r in per_video)
    bad = out.where(
        (F.col("frame_idx") < 0) | (F.col("frame_idx") >= F.col("n_frames"))
    ).count()
    assert bad == 0


def test_resize_plan_prunes_payload_column(spark, sf_dir):
    """The resize stage reads only metadata: the parquet ReadSchema must not
    include the documents ``text`` column the payload derives from."""
    m = media_table(load_table(spark, sf_dir, "documents"))
    explained = resize_images(m)._jdf.queryExecution().executedPlan().toString()
    assert "text" not in explained.split("ReadSchema")[-1], explained[-500:]
