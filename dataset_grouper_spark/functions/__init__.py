from dataset_grouper_spark.functions import (
    featurize,
    hashing,
    textanalysis,
    textstats,
)

__all__ = ["textstats", "textanalysis", "hashing", "featurize"]
