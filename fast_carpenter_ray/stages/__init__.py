from .define import Define, SystematicWeights  # noqa: F401
from .selection import CutFlow, SelectPhaseSpace, build_selection  # noqa: F401
from .binned_dataframe import BinnedDataframe  # noqa: F401
from .skim import EventByEventDataframe  # noqa: F401
