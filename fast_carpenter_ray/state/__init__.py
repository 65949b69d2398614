from .checkpoint import CheckpointSink, checkpoint_write, completed_partitions  # noqa: F401
from .bookkeeping import write_manifest  # noqa: F401
from .accumulator import CutflowAccumulator  # noqa: F401
