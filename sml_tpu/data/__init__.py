from sml_tpu.data.formats import (DatasetInfo, attach_negatives, load_info,
                                  load_train, load_test, write_dataset)
from sml_tpu.data.feeder import PeriodFeeder, StreamingPeriods
from sml_tpu.data.synthetic import SyntheticSpec, generate_synthetic_dataset

__all__ = [
    "DatasetInfo", "attach_negatives", "load_info", "load_train",
    "load_test", "write_dataset",
    "PeriodFeeder", "StreamingPeriods",
    "SyntheticSpec", "generate_synthetic_dataset",
]
