from . import pallas_gmix  # noqa: F401
