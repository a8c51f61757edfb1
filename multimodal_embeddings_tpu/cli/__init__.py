"""Per-stage CLIs mirroring the reference's command surface."""

import os


def apply_env_platform() -> None:
    """Honor ``MMTPU_PLATFORM`` in CLI entry points.

    Standard JAX reads ``JAX_PLATFORMS`` from the environment, but a
    hermetic image's site hook can register an accelerator plugin and
    force the platform at interpreter startup AFTER the environment is
    read — then ``JAX_PLATFORMS=cpu python -m ...cli.serve`` silently
    targets the accelerator and, if it is unreachable, hangs in backend
    init. ``MMTPU_PLATFORM=cpu`` re-asserts the choice through
    ``jax.config`` at CLI startup. A dedicated variable (not re-reading
    ``JAX_PLATFORMS``) so an in-process explicit choice — e.g. the test
    suite's forced-CPU conftest running CLI mains under a preset
    ``JAX_PLATFORMS=axon`` environment — is never overridden. No-op when
    unset.
    """
    env = os.environ.get("MMTPU_PLATFORM")
    if env:
        import jax

        try:
            jax.config.update("jax_platforms", env)
        except Exception:  # pragma: no cover — backend already initialized
            pass
