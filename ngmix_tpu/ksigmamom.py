"""alias module (ref: ngmix/ksigmamom.py)"""
from .prepsfmom import KSigmaMom  # noqa: F401
