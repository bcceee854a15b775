from . import config  # noqa: F401  (side effect: enables x64)
