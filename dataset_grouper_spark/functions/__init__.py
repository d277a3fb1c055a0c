from dataset_grouper_spark.functions import hashing, textanalysis, textstats

__all__ = ["textstats", "textanalysis", "hashing"]
