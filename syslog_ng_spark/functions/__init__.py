from . import filters, macros, templates  # noqa: F401
