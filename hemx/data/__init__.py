from hemx.data.plugin import DataPlugin, get_dataset, get_dataset_tensors
from hemx.data.tfrecord import TFRecordWriter, tfrecord_iterator, count_records
from hemx.data.pipeline import ArraySource, TFRecordSource, Split, Pipeline
