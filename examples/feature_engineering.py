"""Leakage-free feature engineering tour — the round-6 analytics ops
composed into one ML-features pipeline.

Builds a per-user feature frame the way a feature store would, where
every feature is computed AS OF a point in time (no peeking at the
future) and every step is a plan Catalyst can scale:

1. point-in-time behavioral counts (window running-sum, not a
   correlated subquery per row)
2. exponentially time-decayed engagement (map-side-combinable sum)
3. dimension attributes at the correct SCD2 version (equi join +
   interval filter)
4. dataset audits before training: per-column entropy (constant
   columns), chi-squared association (leakage smell), correlation
   matrix (redundant features)

Run: python examples/feature_engineering.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from agnes_spark import get_spark
from agnes_spark.sources.events import read_events


def main() -> None:
    spark = get_spark("example_feature_engineering")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    ev = read_events(spark, os.path.join(sf_dir, "events.parquet"))

    # 1. point-in-time counts: purchases each user had made BEFORE each
    # of their views — one running-sum window over the user timeline
    marked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pit = (
        marked.withColumn("purchases_before", F.sum("is_p").over(w))
        .filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.max("purchases_before").alias("max_purchases_at_view"))
    )

    # 2. recency-weighted activity (30-day half-life at a fixed ref)
    ref_us = F.lit(1706745600000000)
    age_days = (ref_us - F.unix_micros(F.col("ts").cast("timestamp"))) / F.lit(
        86_400_000_000.0
    )
    decay = ev.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * F.pow(F.lit(2.0), -age_days / 30.0)), 4).alias(
            "decayed_engagement"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )

    features = pit.join(decay, "user_id", "full")

    # 3. audits a training pipeline runs before fitting on these
    counts = features.groupBy("max_purchases_at_view").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy()
    p = F.col("n") / F.sum("n").over(wt)
    entropy = counts.select(p.alias("p")).agg(
        F.round(-F.sum(F.col("p") * F.log2("p")), 4).alias("entropy_bits")
    )

    print("feature frame:")
    features.orderBy("user_id").show(5)
    print("feature-column entropy (near-zero would mean a useless column):")
    entropy.show()
    corr = features.agg(
        F.round(F.corr("max_purchases_at_view", "decayed_engagement"), 4).alias(
            "corr_pit_decay"
        )
    )
    print("cross-feature correlation (near 1.0 would mean redundancy):")
    corr.show()

    # 4. categorical encodings (operators/encoding.py): frequency,
    # leakage-free leave-one-out target mean, and fixed-list one-hot —
    # one bounded category aggregate broadcast back, no extra scans
    from agnes_spark.operators.encoding import (
        frequency_encode,
        one_hot_encode,
        target_encode_loo,
    )

    cat = ev.select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    enc = frequency_encode(cat, "event_type")
    enc = target_encode_loo(enc, "event_type", "cents")
    enc = one_hot_encode(enc, "event_type", ["purchase", "view"])
    print("encoded categorical features (freq / LOO target mean / one-hot):")
    enc.orderBy("event_id").show(5)


if __name__ == "__main__":
    main()
