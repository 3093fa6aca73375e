from . import geometry, transforms  # noqa: F401
