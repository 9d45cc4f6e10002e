"""Model: a collection of Sources built from one config, with dataset simulation
and event scoring.

Role parity with the reference Model (reference: blueice/model.py:8-144): the same
config cascade (global config merged into each source entry, ``<name>_rate_multiplier``
rewritten to the per-source ``rate_multiplier``), Poisson toy simulation with range
cut, per-event scoring, and stacked PMF grids. The stacked grids returned by
:meth:`pmf_grids` / :meth:`score_events` are the tensors the TPU likelihood path
consumes directly.
"""

import inspect

import numpy as np

from .. import utils

__all__ = ['Model']


def _simulate_source(source, n, rng):
    """Call source.simulate, passing the generator through when the source's
    signature accepts an ``rng`` argument — full toy reproducibility for
    sources that opt in (the count draw is always seeded either way)."""
    try:
        accepts_rng = 'rng' in inspect.signature(source.simulate).parameters
    except (TypeError, ValueError):
        accepts_rng = False
    if accepts_rng:
        return source.simulate(n, rng=rng)
    return source.simulate(n)


class Model:
    """Collects several Sources; the unit the likelihood layer builds per anchor."""

    defaults = dict(livetime_days=1,
                    data_dirs='.',
                    nohash_settings=['data_dirs', 'pdf_sampling_batch_size',
                                     'force_recalculation'])

    def __init__(self, config, **kwargs):
        """
        :param config: dict specifying detector parameters, source list, etc.
        :param kwargs: overrides for the config.
        """
        self.config = utils.combine_dicts(self.defaults, config, kwargs,
                                          deep_copy=True)
        if 'rate_multiplier' in self.config:
            raise ValueError("Don't put a setting named rate_multiplier in the "
                             "model config please...")

        self.sources = []
        for source_config in self.config['sources']:
            source_class = source_config.get(
                'class', self.config.get('default_source_class'))
            if source_class is None:
                raise ValueError("Source %s has no class and no "
                                 "default_source_class is set"
                                 % source_config.get('name', '?'))
            conf = utils.combine_dicts(
                self.config, source_config,
                exclude=['sources', 'default_source_class', 'class'])

            # <name>_rate_multiplier -> per-source rate_multiplier
            source_name = conf.get('name', 'unnamed_source')
            conf['rate_multiplier'] = conf.get(
                '%s_rate_multiplier' % source_name, 1)
            conf = {k: v for k, v in conf.items()
                    if not k.endswith('_rate_multiplier')}

            self.sources.append(source_class(conf))

        # Prevent accidental (ineffective) modification of the source list
        del self.config['sources']

    # -- source access ---------------------------------------------------------

    def get_source(self, source_id):
        return self.sources[self.get_source_i(source_id)]

    def get_source_i(self, source_id):
        """Source index from an index or (substring of) a source name."""
        if isinstance(source_id, (int, float)):
            return int(source_id)
        for s_i, s in enumerate(self.sources):
            if source_id in s.name:
                return s_i
        raise ValueError("Unknown source %s" % source_id)

    # -- datasets ----------------------------------------------------------------

    def range_cut(self, d):
        """Return events from dataset d inside the analysis-space bounds."""
        mask = np.ones(len(d), dtype=bool)
        for dimension, bin_edges in self.config['analysis_space']:
            mask &= (d[dimension] >= bin_edges[0]) & (d[dimension] <= bin_edges[-1])
        return d[mask]

    def simulate(self, rate_multipliers=None, livetime_days=None, rng=None):
        """Make a toy dataset: Poisson-sample events from all sources.
        :param rate_multipliers: dict {source name: multiplier}.
        :param livetime_days: exposure to simulate (affects all sources).
        :param rng: optional numpy Generator for reproducibility.
        """
        if rate_multipliers is None:
            rate_multipliers = dict()
        if rng is None:
            rng = np.random
        ds = []
        for s_i, source in enumerate(self.sources):
            # Divide by fraction_in_range: simulate() also produces events that
            # will fall outside the analysis space and be cut below.
            mu = (self.expected_events(source)
                  * rate_multipliers.get(source.name, 1)
                  / source.fraction_in_range)
            if livetime_days is not None:
                mu *= livetime_days / self.config['livetime_days']
            d = _simulate_source(source, rng.poisson(mu), rng)
            d['source'] = s_i
            ds.append(d)
        d = np.concatenate(ds)
        return self.range_cut(d)

    def to_analysis_dimensions(self, d):
        """List of arrays of the events' coordinates in the analysis dimensions."""
        return utils.events_to_analysis_dimensions(d, self.config['analysis_space'])

    # -- template tensors ----------------------------------------------------------

    def score_events(self, d):
        """Array (n_sources, n_events) of pdf values for each source and event."""
        return np.vstack([s.pdf(*self.to_analysis_dimensions(d))
                          for s in self.sources])

    def pmf_grids(self):
        """(pmfs, n_model_events): arrays (n_sources, *analysis_space_shape)."""
        grids = [s.get_pmf_grid() for s in self.sources]
        return (np.stack([g[0] for g in grids]),
                np.stack([g[1] for g in grids]))

    def expected_events(self, s=None):
        """Expected events in the analysis range for source s (all sources if None)."""
        if s is None:
            return np.array([self.expected_events(s) for s in self.sources])
        return s.expected_events

    # -- diagnostics ---------------------------------------------------------------

    def show(self, d, ax=None, dims=None, **kwargs):
        """Scatter-plot the events of dataset d in (up to two) analysis dimensions."""
        kwargs.setdefault('s', 5)
        import matplotlib.pyplot as plt
        dim_names, bins = zip(*self.config['analysis_space'])

        if dims is None:
            dims = (0,) if len(bins) == 1 else (0, 1)
        if ax is None:
            ax = plt.gca()

        for s_i, s in enumerate(self.sources):
            q = d[d['source'] == s_i]
            q_in_space = self.to_analysis_dimensions(q)
            ax.scatter(q_in_space[dims[0]],
                       q_in_space[dims[1]] if len(dims) > 1 else np.zeros(len(q)),
                       color=s.config['color'], label=s.config['label'], **kwargs)

        ax.set_xlabel(dim_names[dims[0]])
        ax.set_xlim(bins[dims[0]][0], bins[dims[0]][-1])
        if len(dims) > 1:
            ax.set_ylabel(dim_names[dims[1]])
            ax.set_ylim(bins[dims[1]][0], bins[dims[1]][-1])
