"""Regenerate PLANS.md: formatted physical plans for headline queries.

Usage: python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from agnes_spark import get_spark
from agnes_spark.plans import plan_string

SHOWCASE = [
    ("q6_forecast_revenue", "all predicates pushed to the scan; zero data shuffle"),
    ("q1_pricing_summary", "8 aggregates, one partial+final pass, whole-stage codegen"),
    ("q10_returned_items", "broadcast dims; TakeOrderedAndProject (no global sort)"),
    ("dedup_minhash", "candidate generation is an equi-join on (band, bucket)"),
    ("curation_pipeline", "three scorers fused into one projection over kept docs"),
    ("merge_upsert", "full-outer MERGE shape"),
    ("pii_scrub", "regex scrub+counts fused into one zero-shuffle projection over the scan"),
    ("decontaminate", "eval shingles broadcast; the train side is scanned once, never shuffled"),
    ("embedding_quantize", "int8 quantization as a zero-shuffle projection over the scan"),
    ("sample_to_budget", "one stratum-key exchange feeding the running-sum window"),
    ("interdoc_repetition", "doc-frequency agg + join back, both keyed on the 8-byte shingle hash"),
    ("json_variant", "parse_json once into VARIANT; typed extraction in the same projection"),
    ("q9_product_profit", "widest join in the suite: every dim broadcast, one agg shuffle"),
    ("bloom_pruned_join", "Bloom probe filters the fact side BELOW the join exchange"),
    ("dynamic_partition_prune", "dynamicpruningexpression in the scan's PartitionFilters"),
    (
        "repetition_metrics",
        "per-doc scalars via ONE ArrowEvalPython pass — zero shuffles",
    ),
    (
        "triangle_copurchase",
        "degree-oriented wedge join; shipdate filter pushed to the scan",
    ),
    (
        "cdc_orders_apply",
        "keep-last-per-key in ONE shuffle: WindowGroupLimit prunes rank>1 map-side",
    ),
    (
        "domain_budget_sample",
        "threshold-then-boundary-sort: the per-(domain, key) weight agg "
        "prunes the exact sort to ~budget-worth of rows per domain",
    ),
    (
        "lateral_join_topn",
        "correlated LATERAL + LIMIT decorrelated into a ranked keyed window",
    ),
    (
        "link_prediction_copurchase",
        "kNN-sparsified graph first; every join equi on a node id — no cartesian",
    ),
    (
        "spatial_radius_pairs",
        "half-plane grid join: 5x cell-key shuffle instead of N^2 comparisons",
    ),
    (
        "pareto_frontier_parts",
        "skyline via bounded bucket agg + prefix window; zero all-pairs work",
    ),
    (
        "kmeans_embeddings",
        "assignment is map-only against literal centroids; one k*d-row agg per round",
    ),
    (
        "itemitem_parts",
        "basket pairs expand map-side in ONE shuffle; per-item window cuts top-k",
    ),
    (
        "quantile_norm_docs",
        "rank-to-position arithmetic + bounded interval-frame range join",
    ),
    (
        "psl_registered_domain",
        "full PSL algorithm as per-label-count BROADCAST joins; the big "
        "side never shuffles until the rollup",
    ),
    (
        "media_header_census",
        "WAV chunk walk + MP4 box walks as pure column expressions over "
        "binary — zero Python",
    ),
    (
        "dedup_binary_minhash",
        "byte shingles in codegen (no Arrow UDF); candidates still an "
        "equi-join on (band, bucket)",
    ),
    (
        "decontaminate_fuzzy",
        "recall-lossless candidates from ONE broadcast shared-shingle "
        "join; exact Jaccard in the same aggregation",
    ),
]


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical plans of headline queries\n",
        "Regenerate with `python scripts/dump_plans.py` "
        f"(sf dir: `{sf_dir}`). What to look for: `PushedFilters` on\n"
        "scans, pruned `ReadSchema`, `BroadcastHashJoin` for dims,\n"
        "`WholeStageCodegen` spans, and the absence of\n"
        "`CartesianProduct`.\n",
    ]
    for name, why in SHOWCASE:
        df = qs[name](spark, sf_dir)
        out.append(f"\n## {name}\n\n*{why}*\n\n```\n{plan_string(df).strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
