from . import checkpoint_io, geometry, profiling, transforms, vis  # noqa: F401
