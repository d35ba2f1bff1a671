from sequoia_tpu.data.dataset import FeatureDataset, BatchLoader, filter_no_features  # noqa: F401
from sequoia_tpu.data.splits import patient_kfold, patient_split  # noqa: F401
