from .base import MergeTensorsBase  # noqa: F401
from .fourier import FourierMerge  # noqa: F401
from .fourier_legacy import LegacyFourierMerge  # noqa: F401
from .addition import AdditionMerge  # noqa: F401
from .taskaddition import TaskAdditionMerge  # noqa: F401
from .ties import TiesMerge  # noqa: F401
from .dare import DareMerge  # noqa: F401
from .della import DellaMerge  # noqa: F401
from .breadcrumbs import BreadcrumbsMerge  # noqa: F401
from .linear import LinearMerge  # noqa: F401
from .slerp import SlerpMerge  # noqa: F401
from .modelstock import ModelStockMerge  # noqa: F401

MERGE_METHODS = {
    "fourier": FourierMerge,
    "fourier-legacy": LegacyFourierMerge,
    "addition": AdditionMerge,
    "task-addition": TaskAdditionMerge,
    "ties": TiesMerge,
    "dare": DareMerge,
    "della": DellaMerge,
    "breadcrumbs": BreadcrumbsMerge,
    "linear": LinearMerge,
    "slerp": SlerpMerge,
    "model-stock": ModelStockMerge,
}
