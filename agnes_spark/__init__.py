"""agnes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of agnes-rs/agnes (plus large-scale
LLM-data-pipeline operators).

The reference (agnes) is a Rust data-wrangling library built around
DataStore -> DataFrame -> DataView (reference: src/store.rs,
src/frame.rs, src/view.rs). Here the same surface is re-expressed on
Spark's DataFrame API: views are lazy Catalyst plans, permutations are
ORDER BYs, shared stores are shared scan subtrees.
"""

from agnes_spark.session import get_spark
from agnes_spark.view import DataView

__all__ = ["get_spark", "DataView"]
__version__ = "0.1.0"
