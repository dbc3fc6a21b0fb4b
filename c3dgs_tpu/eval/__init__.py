from .metrics import render_and_eval  # noqa: F401
