"""Common code for tests (shipped inside the package so tests and notebooks can
import it, like the reference's blueice/test_helpers.py).

The three test sources exercise the three main source families:
* GaussianSource — analytic PDF (no template needed);
* GaussianMCSource — same physics through the full MC -> histogram -> template
  pipeline;
* FixedSampleSource — density estimation from literal event arrays, giving exact
  bin counts for closed-form assertions.
"""

from copy import deepcopy
import tempfile

import numpy as np
from scipy import stats

from .models.source import Source, MonteCarloSource, DensityEstimatingSource
from .utils import combine_dicts

# Hermetic per-process cache/task dirs: tests exercise the content-addressed
# cache without littering the working directory.
_TEST_CACHE_DIR = tempfile.mkdtemp(prefix='blueice_tpu_pdf_cache_')
_TEST_TASK_DIR = tempfile.mkdtemp(prefix='blueice_tpu_pdf_tasks_')


class GaussianSourceBase(Source):
    """Source that generates events from a Gaussian."""

    def simulate(self, n_events, rng=None):
        if rng is None or rng is np.random:
            rng = np.random.default_rng(np.random.randint(2 ** 31))
        d = np.zeros(n_events, dtype=[('x', float), ('source', int)])
        d['x'] = rng.normal(self.config['mu'], self.config['sigma'],
                            n_events)
        return d


class GaussianSource(GaussianSourceBase):
    """A 1d source with an analytic Gaussian PDF. Config hooks:
    ``some_multiplier`` (numeric shape parameter) and ``strlen_multiplier``
    (non-numeric: rate scales with the string's length)."""

    def compute_pdf(self):
        self.events_per_day *= self.config.get('some_multiplier', 1)
        self.events_per_day *= len(self.config.get('strlen_multiplier', 'x'))
        super().compute_pdf()

    def pdf(self, *args):
        if not self.pdf_has_been_computed:
            raise RuntimeError("Trying to call a PDF that hasn't been computed!")
        return stats.norm(self.config['mu'],
                          self.config['sigma']).pdf(args[0])


class GaussianMCSource(GaussianSourceBase, MonteCarloSource):
    """Same Gaussian, but the PDF template comes from its own MC."""
    pass


class FixedSampleSource(DensityEstimatingSource):
    """Density estimated from a literal event sample in config['data']."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.events_per_day *= len(self.config.get('strlen_multiplier', 'x'))

    def get_events_for_density_estimate(self):
        return self.config['data'], len(self.config['data'])


BASE_CONFIG = dict(
    sources=[{'name': 's0', 'events_per_day': 1000.}],
    mu=0,
    strlen_multiplier='q',
    events_per_day=1000.,
    n_events_for_pdf=int(1e6),
    sigma=1,
    default_source_class=GaussianSource,
    some_multiplier=1,
    analysis_space=[['x', np.linspace(-10, 10, 100)]],
    cache_dir=_TEST_CACHE_DIR,
    task_dir=_TEST_TASK_DIR,
)


# Base conv_config for reparameterization tests: three "old" rates quadratic /
# bilinear in two "new" couplings.
BASE_CONV_CONFIG = dict(
    np0=(np.linspace(1e-12, 10, 2), None, None),
    np1=(np.linspace(1e-12, 10, 2), None, None),
    op0_rate_multiplier=dict(params=["np0"], func=lambda np0: np0 ** 2),
    op1_rate_multiplier=dict(params=["np1"], func=lambda np1: np1 ** 2),
    op2_rate_multiplier=dict(params=["np0", "np1"],
                             func=lambda np0, np1: np0 * np1),
)


def conf_for_test(n_sources=1, mc=False, **kwargs):
    conf = deepcopy(BASE_CONFIG)
    conf['sources'] = [{'name': 's%d' % i} for i in range(n_sources)]
    if mc:
        conf['default_source_class'] = GaussianMCSource
    return combine_dicts(conf, kwargs)


def conf_for_reparam_test(n_source=1, mc=False, **kwargs):
    conf = conf_for_test(n_source, mc, **kwargs)
    conf["sources"] = [dict(name="op0"), dict(name="op1"), dict(name="op2")]
    conf["np0"] = 1
    conf["np1"] = 1
    return conf


def almost_equal(a, b, fraction=1e-6):
    return abs((a - b) / a) <= fraction


def make_data(instructions):
    """make_data([dict(n_events=24, x=0.5), dict(n_events=56, x=1.5)]) produces
    24 events with x=0.5 and 56 events with x=1.5.
    :return: (numpy record array accepted by set_data, total event count)
    """
    n_tot = sum(x['n_events'] for x in instructions)
    d = np.zeros(n_tot, dtype=[('source', int), ('x', float), ('y', float)])
    n_done = 0
    for instr in instructions:
        sl = slice(n_done, n_done + instr['n_events'])
        for k, v in instr.items():
            if k != 'n_events':
                d[sl][k] = v
        n_done += instr['n_events']
    return d, n_tot
