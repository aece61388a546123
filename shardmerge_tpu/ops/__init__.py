from .select import kth_smallest_nonneg  # noqa: F401
