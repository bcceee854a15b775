from ..utils import config as _config  # noqa: F401  (enables x64 first)
