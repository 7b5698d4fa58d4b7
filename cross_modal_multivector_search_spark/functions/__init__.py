from . import vector, metrics  # noqa: F401
