"""Identity stand-in for ``beartype`` (runtime type checking disabled
when executing the reference through the shim — see ``equinox.py``)."""


def beartype(fn):
    return fn
