from . import cover, hierarchy  # noqa: F401
