from .codegen import ensure_fixture, generate  # noqa: F401
