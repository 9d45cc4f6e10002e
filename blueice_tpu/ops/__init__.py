from .hist import Hist
from .interp import (morph_weights, morph_templates, interp_at_points,
                     piecewise_lookup, morph_templates_np, interp_at_points_np)
from .poisson import poisson_logpmf, binned_poisson_logl, extended_logl
from .beeston_barlow import (beeston_barlow_root1, beeston_barlow_root2,
                             beeston_barlow_roots, bb_single_adjust)
from .sampling import sample_from_template, poisson_counts
