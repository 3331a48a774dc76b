from .obs import vt_load  # noqa: F401
