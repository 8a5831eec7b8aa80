"""nupgcm_tpu: TPU-native planetary-geostrophic ocean model.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference nuPGCM (hgpeterson/nuPGCM): continuous-Galerkin P2-P1
Taylor-Hood finite elements on unstructured tri/tet meshes solving the
nondimensional PG equations -- a rotating-Stokes inversion (GMRES) and
an implicit-diffusion / explicit-advection buoyancy evolution (CG) --
with the entire timestep fused into jitted device code.
"""

def _enable_compilation_cache():
    """Point JAX at a persistent compilation cache unless the user
    already configured one -- TPU compiles of the fused step are
    expensive and fully reusable across runs."""
    import os

    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    path = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "nupgcm_tpu", "jax_cache",
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

from .models.config import (
    ConvectionParameterization,
    EddyParameterization,
    Forcings,
    Parameters,
    SurfaceDirichletBC,
    SurfaceFluxBC,
)
from .models.fedata import FEData, Spaces
from .models.model import BlowUpError, PGModel, State
from .models.timesteppers import BDF1, BDF2
from .mesh.core import Mesh
from .mesh.gmsh_reader import read_msh
from .mesh.writer import write_msh
from .mesh import generators
from .utils.timing import memory_status, print_memory_status
from . import plotting, postprocess

__version__ = "0.1.0"
__all__ = [
    "Parameters", "Forcings", "SurfaceDirichletBC", "SurfaceFluxBC",
    "ConvectionParameterization", "EddyParameterization",
    "Spaces", "FEData", "PGModel", "State", "BlowUpError",
    "BDF1", "BDF2", "Mesh", "read_msh", "write_msh", "generators",
    "plotting", "postprocess", "memory_status", "print_memory_status",
]
