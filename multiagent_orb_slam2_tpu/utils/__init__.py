from . import diag  # noqa: F401
