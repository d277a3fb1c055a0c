from dataset_grouper_spark.operators.group_counts import compute_group_counts
from dataset_grouper_spark.operators.packing import pack_groups

__all__ = ["compute_group_counts", "pack_groups"]
