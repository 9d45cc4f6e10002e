"""blueice_tpu: Build Likelihoods Using Efficient Interpolations and
monte-Carlo generated Events — TPU-native.

A from-scratch re-design of the blueice framework (parametric statistical
inference for astroparticle physics) for TPU hardware: PDF templates are dense
device-resident tensors, anchor-point morphing is fused multilinear interpolation,
likelihoods compile (jit/grad/vmap) to single XLA programs, and toy-MC ensembles
fit in parallel across a device mesh.

Import layout mirrors the reference package (reference: blueice/__init__.py:4-9):
likelihood, model, source, exceptions and parallel are flattened into the top-level
namespace; inference functions are grafted onto the likelihood classes as methods.
"""

__version__ = '0.1.0'

from .exceptions import *            # noqa: F401,F403
from .models.model import *          # noqa: F401,F403
from .models.source import *         # noqa: F401,F403
from .likelihood import *            # noqa: F401,F403
from .parallel.tasks import *        # noqa: F401,F403
from .priors import *                # noqa: F401,F403
from .models.jax_source import JaxDensitySource  # noqa: F401
from .morphers import MORPHERS       # noqa: F401
from .compile import build_logl      # noqa: F401


def enable_x64():
    """Enable float64 in jax. Recommended on CPU for bit-level parity studies;
    TPU runs float32 templates by default (cast via likelihood dtype options)."""
    import jax
    jax.config.update('jax_enable_x64', True)
