from .config import Sequence, load_pipeline, STAGE_REGISTRY, register_stage  # noqa: F401
from .datasets import DatasetSpec, MultiDatasetRun  # noqa: F401
