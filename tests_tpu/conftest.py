"""On-TPU smoke tests: run with ``python -m pytest tests_tpu/ -x -q``
on a machine with a real TPU attached.

Unlike tests/ (which forces an 8-virtual-device CPU backend, x64),
this suite uses the default backend and f32 -- the production
configuration -- and every test skips unless the default backend is a
TPU.  Purpose: catch Mosaic/XLA lowering failures of the production
Pallas kernels that interpret-mode CPU tests cannot see by
construction (the round-3 regression class).
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="requires a real TPU backend")
        for item in items:
            item.add_marker(skip)
