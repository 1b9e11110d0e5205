"""Environment setup hook (reference: slowfast/utils/env.py:11-15).

Deliberately import-free beyond the stdlib: tests/conftest.py imports
:func:`machine_cache_dir` before JAX's backend may be initialized.
"""


def setup_environment():
    """No-op extension point, kept for API parity."""
    pass


def machine_cache_dir(base: str) -> str:
    """Suffix a compile-cache dir with a hash of the host CPU feature set.

    XLA:CPU loads persistent-cache AOT results compiled on a DIFFERENT
    machine with only a warning ("could lead to execution errors such as
    SIGILL") — after a VM migration the stale blobs execute with mismatched
    machine features and can compute garbage (observed: nondeterministic
    NaNs in training that vanish with a fresh cache). Keying the directory
    by the CPU flags turns a migration into a cache miss instead. Shared by
    tests/conftest.py and bench.py so the scheme cannot diverge.
    """
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    return f"{base}-{hashlib.sha1(flags.encode()).hexdigest()[:10]}"
