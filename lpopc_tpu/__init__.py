"""lpopc_tpu — a TPU-native multiple-phase optimal-control engine.

From-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
C++ library ``eddyxzc/lpopc`` (adaptive Radau pseudospectral method + IPOPT):
LGR collocation, exact-AD NLP transcription, a batched primal-dual
interior-point solver with MXU-friendly KKT factorizations, hp-adaptive mesh
refinement, and instance-axis scale-out over device meshes.

Optimal control wants double precision; x64 is enabled at import (opt out with
``LPOPC_TPU_NO_X64=1`` before importing). f64 is fully supported on the target
TPU generation.
"""

import os as _os

import jax as _jax

if not _os.environ.get("LPOPC_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (opt-in): mesh-refinement loops and
# tunneled-TPU compiles (60-120 s each) amortize across runs. Set
# LPOPC_TPU_CACHE_DIR to enable; bench.py enables it for TPU runs. (Not on by
# default because XLA:CPU AOT cache entries are machine-feature-pinned and
# warn/SIGILL when the pinning mismatches.)
if _os.environ.get("LPOPC_TPU_CACHE_DIR"):
    try:
        _jax.config.update(
            "jax_compilation_cache_dir", _os.environ["LPOPC_TPU_CACHE_DIR"]
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

from .core.problem import INF, Linkage, Phase, Problem  # noqa: E402,F401
from .core.transcribe import NLP, transcribe  # noqa: E402,F401

__version__ = "0.1.0"
