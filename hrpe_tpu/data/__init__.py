from . import const  # noqa: F401
