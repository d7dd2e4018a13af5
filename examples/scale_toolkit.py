"""Tour of the scale toolkit: layout, audit, quantization, filtering.

  1. audit_plan          lint a query's physical plan for scale red flags
  2. write_zordered      multi-dimensionally clustered parquet layout
  3. quantize_embeddings int8 corpus for cheap ANN serving
  4. quality classifier  model-based filtering (train small, score all)
  5. sample_to_budget    per-domain token budgets for the final mix
  6. bloom_semi_join     prune a fact table below the join exchange

Run: python examples/scale_toolkit.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from agnes_spark import get_spark
from agnes_spark.operators.embeddings import quantize_embeddings
from agnes_spark.operators.mlinterop import score_with_model, train_quality_classifier
from agnes_spark.operators.partitioning import write_zordered
from agnes_spark.operators.sampling import sample_to_budget_scalable
from agnes_spark.plans import audit_plan


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scale_toolkit_example")
    base = tempfile.mkdtemp(prefix="agnes_toolkit_")

    # 1. plan audit: catch the scale killers before they run
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    q = li.filter(F.col("l_quantity") > 45).groupBy("l_returnflag").agg(
        F.sum("l_extendedprice").alias("rev")
    )
    print("plan audit findings:", audit_plan(q) or "clean")

    # 2. z-order layout: filters on either key prune the files
    write_zordered(
        li.select("l_orderkey", "l_partkey", "l_quantity"),
        os.path.join(base, "zli"),
        ["l_orderkey", "l_partkey"],
    )
    print("z-ordered files:", len(spark.read.parquet(os.path.join(base, "zli")).inputFiles()))

    # 3. int8 quantization: 4x smaller ANN corpus
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q8 = quantize_embeddings(emb, "vec_id")
    print("quantized vectors:", q8.count())

    # 4. model-based quality filter (derived target for the demo)
    labeled = emb.withColumn(
        "target",
        ((F.element_at("embedding", 1) + F.element_at("embedding", 2)) > 0).cast("int"),
    )
    model, _holdout = train_quality_classifier(labeled, "vec_id", "embedding", "target")
    kept = score_with_model(model, emb, "vec_id", "embedding").filter(
        F.col("confidence") >= 0.8
    )
    print("confident slice:", kept.count(), "of", emb.count())

    # 5. final mix: fill a 2000-char budget per source
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    mix = sample_to_budget_scalable(docs, "source", "doc_id", "n_chars", 2000.0)
    print("mixed docs:", mix.count())

    # 6. bloom semi-join reduction: size from the key count, prune the
    # fact side before it ever reaches the join shuffle
    from agnes_spark.operators.bloomjoin import bloom_semi_join

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    hot = orders.filter(F.col("o_totalprice") > 300000.0)
    joined = bloom_semi_join(li, hot, "l_orderkey", "o_orderkey")
    print("bloom-pruned join rows:", joined.count())
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
