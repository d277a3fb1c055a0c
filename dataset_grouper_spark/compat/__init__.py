from dataset_grouper_spark.compat import tfexample, tfrecord

__all__ = ["tfexample", "tfrecord"]
