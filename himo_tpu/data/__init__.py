from himo_tpu.data.schema import FrameData, write_frame, read_frame, SCHEMA_DTYPES  # noqa: F401
from himo_tpu.data.dataset import SceneFlowDataset, HDF5Dataset  # noqa: F401
from himo_tpu.data.index import create_reading_index, load_index, save_index  # noqa: F401
from himo_tpu.data.padding import pad_to_bucket, bucket_size  # noqa: F401
