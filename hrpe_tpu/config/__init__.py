from .defaults import Config, load_config, make_default_config  # noqa: F401
