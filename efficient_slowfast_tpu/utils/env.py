"""Environment setup hook (reference: slowfast/utils/env.py:11-15).

Deliberately import-free beyond the stdlib: tests/conftest.py imports
:func:`machine_cache_dir` before JAX's backend may be initialized.
"""


def setup_environment():
    """No-op extension point, kept for API parity."""
    pass


def honor_jax_platforms():
    """Make ``JAX_PLATFORMS`` work even when a site hook pre-imported jax.

    jax reads the env var only at first import; a sitecustomize that
    initializes jax first (e.g. to pin a tunneled TPU plugin) silently
    swallows it, so ``JAX_PLATFORMS=cpu python ...`` would still run on the
    pinned backend. Calling this before first backend use re-applies the
    requested platform; it is a no-op when jax already picked it, and a
    logged no-op when the backend is already initialized (too late to
    switch). Shared by every entry point (tools/run_net.py, bench.py,
    tools/benchmark.py) so the workaround cannot drift per-script.
    """
    import os

    if not os.environ.get("JAX_PLATFORMS"):
        return
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception as e:
        # backend already initialized — too late to switch; say so, or a
        # benchmark silently runs on the wrong backend
        import logging

        logging.getLogger(__name__).warning(
            "JAX_PLATFORMS=%s ignored: backend already initialized (%s)",
            os.environ["JAX_PLATFORMS"], e)


def machine_cache_dir(base: str) -> str:
    """Suffix a compile-cache dir with a hash of the host CPU feature set.

    XLA:CPU loads persistent-cache AOT results compiled on a DIFFERENT
    machine with only a warning ("could lead to execution errors such as
    SIGILL") — after a VM migration the stale blobs execute with mismatched
    machine features and can compute garbage (observed: nondeterministic
    NaNs in training that vanish with a fresh cache). Keying the directory
    by the CPU identity turns a migration into a cache miss instead. Shared
    by tests/conftest.py and bench.py so the scheme cannot diverge.

    The key covers the flags line AND the model name: LLVM derives tuning
    features like ``prefer-no-scatter/gather`` from the CPU *model*, so two
    hosts with identical flags can still produce (and refuse/mis-load) each
    other's AOT blobs — observed as cpu_aot_loader "machine type doesn't
    match" errors after a migration that preserved the flags hash.
    """
    import hashlib

    ident = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    ident += line
                    if ident.count("\n") >= 2:
                        break
    except OSError:
        pass
    return f"{base}-{hashlib.sha1(ident.encode()).hexdigest()[:10]}"
