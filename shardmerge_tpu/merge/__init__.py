from .base import MergeTensorsBase  # noqa: F401
from .fourier import FourierMerge  # noqa: F401
from .fourier_legacy import LegacyFourierMerge  # noqa: F401
from .addition import AdditionMerge  # noqa: F401
from .taskaddition import TaskAdditionMerge  # noqa: F401
from .ties import TiesMerge  # noqa: F401
from .dare import DareMerge  # noqa: F401
from .linear import LinearMerge  # noqa: F401
from .slerp import SlerpMerge  # noqa: F401

MERGE_METHODS = {
    "fourier": FourierMerge,
    "fourier-legacy": LegacyFourierMerge,
    "addition": AdditionMerge,
    "task-addition": TaskAdditionMerge,
    "ties": TiesMerge,
    "dare": DareMerge,
    "linear": LinearMerge,
    "slerp": SlerpMerge,
}
