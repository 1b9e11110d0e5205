"""Environment setup hook (reference: slowfast/utils/env.py:11-15)."""


def setup_environment():
    """No-op extension point, kept for API parity."""
    pass
