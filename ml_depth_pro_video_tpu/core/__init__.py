from .precision import Precision  # noqa: F401
