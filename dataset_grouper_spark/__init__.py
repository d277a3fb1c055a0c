"""dataset_grouper_spark — a PySpark-native group-partitioning engine.

A from-scratch re-expression of the capabilities of
google-parfait/dataset_grouper (reference: /root/reference, v0.3.0) on
Apache Spark DataFrames, extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, multimodal
columns, text analysis).

Design stance (SURVEY.md §7): data stays relational end-to-end. A
"partitioned dataset" is a Parquet table keyed by a ``group_id``
column, not proto blobs; all reference semantics are reproduced with
declarative DataFrame ops so Catalyst plans the physical execution
(partial aggregation, pushdown, AQE) for free.

Reference surface covered (citations are file:line in the reference):
- group keying           -> keys.py        (types.py:31, examples/datasets/*)
- group counts pipeline  -> operators/group_counts.py (beam_transforms.py:112-131)
- byte-capped packing    -> operators/packing.py      (beam_transforms.py:31-109)
- partitioned write      -> sinks/         (tfds_pipelines.py:25-78)
- group-stream loading   -> loader.py      (data_loaders.py:70-125)
- byte/word scalar fns   -> functions/textstats.py    (tf_utils.py:20-60)
- one-call pipelines     -> pipelines.py   (tfds_pipelines.py:25-141)
"""

from dataset_grouper_spark import keys, pipelines
from dataset_grouper_spark.pipelines import tfds_group_counts, tfds_to_tfrecords
from dataset_grouper_spark.functions import textanalysis, textstats
from dataset_grouper_spark.loader import PartitionedDataset
from dataset_grouper_spark.operators.group_counts import compute_group_counts
from dataset_grouper_spark.operators.packing import BYTES_LIMIT, pack_groups
from dataset_grouper_spark.session import get_spark
from dataset_grouper_spark.test_utils import prepare_test_tfrecord_dataset

__version__ = "0.1.0"

__all__ = [
    "keys",
    "pipelines",
    "tfds_to_tfrecords",
    "tfds_group_counts",
    "textstats",
    "textanalysis",
    "PartitionedDataset",
    "compute_group_counts",
    "pack_groups",
    "BYTES_LIMIT",
    "get_spark",
    "prepare_test_tfrecord_dataset",
    "__version__",
]
