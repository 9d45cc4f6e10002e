"""Lower a prepared likelihood to one pure jax function.

This is the TPU-native inversion of the reference's evaluation path (reference:
blueice/likelihood.py:318-427, which is host-side numpy + scipy interpolator
objects called hundreds of times per fit): everything the host ``__call__`` does —
anchor morphing, rate multipliers, priors, livetime scaling, efficiencies,
physicality masking, Beeston-Barlow adjustment, the Poisson/extended reduction —
becomes a single XLA computation over the dense anchor tensors built by
``prepare()``/``set_data()``. The result composes with jit / grad / hessian /
vmap, which is what the gradient fitter (:mod:`blueice_tpu.parallel.fitter`) and
the mesh-sharded toy ensembles (:mod:`blueice_tpu.parallel.toys`) consume.

Out-of-bounds and unphysical parameter points return -inf exactly like the host
path, but are computed with the clamped-input/`where`-mask pattern so gradients
stay finite for the optimizer.
"""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from .ops.beeston_barlow import bb_single_adjust
from .ops.bb_lite import bb_lite_logl
from .ops.poisson import (binned_poisson_logl, binned_poisson_logl_constant,
                          extended_logl)

__all__ = ['CompiledLogLikelihood', 'build_logl', 'cached_logl',
           'build_logl_sum', 'build_logl_reparam', 'build_logl_ancillary']


def build_logl_reparam(rp, dtype=None, include_livetime=False,
                       with_priors=True):
    """Compile a LogLikelihoodReParam: the wrapped likelihood compiles to its
    usual XLA program, and the (differentiable) parameter transform is traced
    in front of it — new parameters flow by gradient straight through
    ``func(*params)/func(*base)`` into the rate multipliers.
    """
    child = build_logl(rp._likelihood, dtype=dtype,
                       include_livetime=include_livetime,
                       with_priors=with_priors)
    transform = rp.transform
    targets = set(transform.targets)
    inputs = list(transform.input_names)
    unknown = targets - set(child.param_names)
    if unknown:
        # The host path raises when the transform's output reaches
        # _kwargs_to_settings; a typo'd target here would otherwise make the
        # new parameters silent no-ops in the compiled fit
        from .exceptions import InvalidParameter
        raise InvalidParameter(
            "Transform target(s) %s are not parameters of the wrapped "
            "likelihood (has: %s)"
            % (sorted(unknown), list(child.param_names)))

    defaults = OrderedDict()
    bounds = OrderedDict()
    passthrough = [p for p in child.param_names if p not in targets]
    for p in passthrough:
        defaults[p] = child.defaults[p]
        bounds[p] = child.bounds[p]
    for p in inputs:
        defaults[p] = float(transform.base_values[p])
        bounds[p] = rp.get_bounds(p)
    param_names = passthrough + inputs

    def _child_params(params):
        converted = transform({p: params[p] for p in inputs})
        return {p: (converted[p] if p in targets else params[p])
                for p in child.param_names}

    def logl(params):
        return child.logl(_child_params(params))

    def logl_with_data(params, data, mask=None, include_constant=True):
        return child.logl_with_data(_child_params(params), data, mask,
                                    include_constant)

    compiled = CompiledLogLikelihood(logl, logl_with_data, param_names,
                                     defaults, bounds, child.data, rp)
    compiled.rates = lambda params: child.rates(_child_params(params))
    compiled.densities = lambda params: child.densities(_child_params(params))
    if hasattr(child, 'expected_counts'):
        compiled.expected_counts = (
            lambda params: child.expected_counts(_child_params(params)))
    compiled.data_constant = child.data_constant
    compiled.is_binned = child.is_binned
    compiled.dtype = dtype
    compiled.has_bb = child.has_bb
    compiled.has_bb_lite = getattr(child, 'has_bb_lite', False)
    compiled.shape_names = [p for p in param_names
                            if not p.endswith('_rate_multiplier')]
    compiled.rate_names = [p for p in param_names
                           if p.endswith('_rate_multiplier')]
    compiled.prior_terms = child.prior_terms
    compiled.ps_tensor = None   # the transform precedes the anchor morphing
    compiled.anchor_arrays = None
    return compiled


def build_logl_ancillary(anc, dtype=None, include_livetime=False,
                         with_priors=True):
    """Compile a LogAncillaryLikelihood: its func must be jax-traceable
    (ordinary arithmetic / jnp calls on the parameter values)."""
    param_names = list(anc.shape_parameters)
    defaults = OrderedDict(
        (p, float(anc.pdf_base_config[p])) for p in param_names)
    bounds = OrderedDict((p, anc.get_bounds(p)) for p in param_names)

    def logl(params):
        values = OrderedDict((p, jnp.asarray(params[p]))
                             for p in param_names)
        return anc.func(values, **anc.func_kwargs)

    try:
        jax.eval_shape(logl, {p: jnp.zeros(()) for p in param_names})
    except Exception as e:
        raise TypeError(
            "The ancillary likelihood's func is not jax-traceable, so it "
            "cannot be compiled (use jnp/arithmetic expressions instead of "
            "e.g. scipy.stats frozen logpdfs; the host __call__ path still "
            "accepts those)") from e

    def logl_with_data(params, data, mask=None, include_constant=True):
        return logl(params)   # an analytic term has no dataset

    compiled = CompiledLogLikelihood(logl, logl_with_data, param_names,
                                     defaults, bounds, None, anc)
    compiled.data_constant = lambda data: jnp.zeros(())
    compiled.is_binned = None    # dataset-free: binned/unbinned-agnostic
    compiled.has_data = False
    compiled.dtype = dtype
    compiled.has_bb = False
    compiled.has_bb_lite = False
    compiled.shape_names = param_names
    compiled.rate_names = []
    compiled.prior_terms = []
    compiled.ps_tensor = None
    compiled.anchor_arrays = None
    return compiled


def build_logl_sum(sum_lf, dtype=None, include_livetime=False,
                   with_priors=True):
    """Compile a LogLikelihoodSum: each child compiles on its own anchor
    tensors; the joint logl routes parameters by name and adds the weighted
    child terms — one XLA program for combined (e.g. multi-science-run) fits.
    """
    children = [build_logl(ll, dtype=dtype,
                           include_livetime=include_livetime,
                           with_priors=with_priors)
                for ll in sum_lf.likelihood_list]
    weights = [float(w) for w in sum_lf.likelihood_weights]

    # Only parameters DECLARED on a child (its registered rate parameters and
    # shape parameters) are routed to it — undeclared rate multipliers of
    # shared source names stay at their defaults, matching the host Sum's
    # routing (reference: blueice/likelihood.py:895-927)
    routed = [set(names) for names in sum_lf.likelihood_parameters]
    if include_livetime:
        # livetime is not a declared parameter; every child that compiled
        # with it shares the single joint livetime value
        for i, c in enumerate(children):
            if 'livetime_days' in c.param_names:
                routed[i].add('livetime_days')

    def _intersect(b0, b1):
        """Joint bounds of a shared parameter (None = unbounded), matching
        the host Sum's intersection semantics (composition.get_bounds)."""
        lo = (b1[0] if b0[0] is None else b0[0] if b1[0] is None
              else max(b0[0], b1[0]))
        hi = (b1[1] if b0[1] is None else b0[1] if b1[1] is None
              else min(b0[1], b1[1]))
        return lo, hi

    defaults = OrderedDict()
    bounds = OrderedDict()
    param_names = []
    for i, c in enumerate(children):
        for p in c.param_names:
            if p not in routed[i]:
                continue
            if p not in defaults:
                defaults[p] = c.defaults[p]
                bounds[p] = c.bounds[p]
                param_names.append(p)
            else:
                bounds[p] = _intersect(bounds[p], c.bounds[p])
                if float(c.defaults[p]) != float(defaults[p]):
                    # A compiled joint fit has ONE value per shared parameter;
                    # the host sum evaluated with no kwargs would use each
                    # child's own base value, so flag the divergence loudly
                    import warnings
                    warnings.warn(
                        "Children of this LogLikelihoodSum disagree on the "
                        "default of shared parameter %r (%s vs %s); the "
                        "compiled likelihood uses the first child's value "
                        "as ITS default/starting point, while the host sum "
                        "evaluated without kwargs uses each child's own base "
                        "value" % (p, defaults[p], c.defaults[p]))

    def _child_params(params, i):
        c = children[i]
        return {p: (params[p] if p in routed[i] else c.defaults[p])
                for p in c.param_names}

    def logl(params):
        out = jnp.zeros(())
        for i, (c, w) in enumerate(zip(children, weights)):
            out = out + w * c.logl(_child_params(params, i))
        return out

    def logl_with_data(params, data, mask=None, include_constant=True):
        """``data``/``mask`` are sequences, one entry per child."""
        out = jnp.zeros(())
        for i, (c, w) in enumerate(zip(children, weights)):
            mi = None if mask is None else mask[i]
            out = out + w * c.logl_with_data(_child_params(params, i),
                                             data[i], mi, include_constant)
        return out

    compiled = CompiledLogLikelihood(logl, logl_with_data, param_names,
                                     defaults, bounds,
                                     [c.data for c in children], sum_lf)
    compiled.children = children
    # Per-child routing metadata for the Sum closed-form fit engine
    # (parallel.fitter._make_sum_analytic_parts): which joint parameters are
    # DECLARED on each child, and each child's likelihood weight
    compiled.child_weights = weights
    compiled.child_routed = [frozenset(r) for r in routed]
    # Dataset-free children (ancillary terms) don't vote on binnedness
    compiled.is_binned = all(c.is_binned for c in children
                             if getattr(c, 'has_data', True))
    compiled.dtype = dtype
    compiled.has_bb = any(c.has_bb for c in children)
    compiled.has_bb_lite = any(getattr(c, 'has_bb_lite', False)
                               for c in children)
    compiled.shape_names = [p for p in param_names
                            if not p.endswith('_rate_multiplier')]
    compiled.rate_names = [p for p in param_names
                           if p.endswith('_rate_multiplier')]
    compiled.prior_terms = [t for c in children for t in c.prior_terms]
    compiled.ps_tensor = None       # analytic/pallas engines: per-child only
    compiled.anchor_arrays = None

    def data_constant(data):
        out = jnp.zeros(())
        for i, (c, w) in enumerate(zip(children, weights)):
            out = out + w * c.data_constant(data[i])
        return out
    compiled.data_constant = data_constant

    def expected_counts(params):
        """Tuple of per-child expected-count tensors at params (empty array
        for dataset-free children like ancillary constraints) — the Poisson
        means a joint binned toy study simulates from."""
        out = []
        for i, c in enumerate(children):
            if not getattr(c, 'has_data', True):
                out.append(jnp.zeros((0,)))
            else:
                out.append(c.expected_counts(_child_params(params, i)))
        return tuple(out)
    compiled.expected_counts = expected_counts
    return compiled


class CompiledLogLikelihood:
    """A pure-jax log likelihood plus its parameter metadata.

    Attributes:
      logl: function params_dict -> scalar loglikelihood (jit/grad/vmap-able).
      logl_with_data: function (params_dict, data) -> scalar, where ``data`` is
        the observed-counts tensor (binned) or a (n_sources, n_events) ps tensor
        plus event mask (unbinned) — the entry point for batched toys.
      param_names: all parameter names, rates first then shapes
        (+ 'livetime_days' if included).
      defaults / bounds: per-parameter base values and (lo, hi) tuples.
    """

    #: dataset-free terms (ancillary constraints) override this to False
    has_data = True

    def __init__(self, logl, logl_with_data, param_names, defaults, bounds,
                 data, source_likelihood):
        self.logl = logl
        self.logl_with_data = logl_with_data
        self.param_names = list(param_names)
        self.defaults = dict(defaults)
        self.bounds = dict(bounds)
        self.data = data
        self.lf = source_likelihood

    def params_from_kwargs(self, **kwargs):
        """Full params dict: defaults overridden by kwargs."""
        unknown = set(kwargs) - set(self.param_names)
        if unknown:
            raise ValueError("Unknown parameters: %s" % sorted(unknown))
        p = dict(self.defaults)
        p.update(kwargs)
        return p

    def __call__(self, **kwargs):
        return self.logl(self.params_from_kwargs(**kwargs))


def _check_prior_traceable(name, prior):
    try:
        jax.eval_shape(prior, jnp.zeros(()))
    except Exception as e:
        raise TypeError(
            "The log prior of parameter %r (%r) is not jax-traceable, so the "
            "likelihood cannot be compiled. Use blueice_tpu.NormalPrior / "
            "UniformPrior or any jnp-built callable instead of e.g. "
            "scipy.stats frozen logpdfs (the host __call__ path still accepts "
            "those)." % (name, prior)) from e


def cached_logl(lf):
    """:func:`build_logl` with a per-likelihood cache, invalidated whenever
    ``prepare()`` or ``set_data()`` bumps the payload version — so interval
    scans and repeated samplers compile exactly once per dataset, and a new
    dataset always gets a fresh program. (id()-based tokens are unsafe:
    CPython reuses addresses.) One implementation, shared by
    ``bestfit_jax`` and ``bestfit_emcee_device``."""
    token = getattr(lf, '_build_version', None)
    if token is None and hasattr(lf, 'likelihood_list'):
        token = tuple(getattr(ll, '_build_version', None)
                      for ll in lf.likelihood_list)
    cached = getattr(lf, '_compiled_for_fit', None)
    if cached is None or cached[0] != token:
        lf._compiled_for_fit = cached = (token, build_logl(lf))
    return cached[1]


def build_logl(lf, dtype=None, include_livetime=False, with_priors=True):
    """Compile the prepared (and, for unbinned, data-bound) likelihood ``lf``.

    :param dtype: cast the anchor tensors (float32 recommended on TPU;
      None keeps the build dtype).
    :param include_livetime: expose 'livetime_days' as a parameter (requires a
      nonzero base livetime in the config).
    :param with_priors: include rate/shape log-prior terms (they must be
      jax-traceable callables).
    :return: :class:`CompiledLogLikelihood`.
    """
    from .likelihood import BinnedLogLikelihood, UnbinnedLogLikelihood
    from .composition import (LogLikelihoodSum, LogLikelihoodReParam,
                              LogAncillaryLikelihood)

    if isinstance(lf, LogLikelihoodSum):
        return build_logl_sum(lf, dtype=dtype,
                              include_livetime=include_livetime,
                              with_priors=with_priors)
    if isinstance(lf, LogLikelihoodReParam):
        return build_logl_reparam(lf, dtype=dtype,
                                  include_livetime=include_livetime,
                                  with_priors=with_priors)
    if isinstance(lf, LogAncillaryLikelihood):
        return build_logl_ancillary(lf, dtype=dtype,
                                    include_livetime=include_livetime,
                                    with_priors=with_priors)
    if not hasattr(lf, 'is_prepared'):
        raise TypeError("Cannot compile %r — expected a Binned/Unbinned "
                        "LogLikelihood (or a LogLikelihoodSum of them)"
                        % type(lf).__name__)

    if not lf.is_prepared:
        if len(lf.shape_parameters):
            raise RuntimeError("Call prepare() before compiling the likelihood")
        lf.prepare()

    is_binned = isinstance(lf, BinnedLogLikelihood)
    if not is_binned and not isinstance(lf, UnbinnedLogLikelihood):
        raise TypeError("Can only compile Binned/Unbinned log likelihoods")

    source_names = list(lf.source_name_list)
    n_sources = len(source_names)
    shape_names = list(lf.shape_parameters.keys())
    rate_names = [sn + '_rate_multiplier' for sn in source_names]

    # -- parameter metadata ----------------------------------------------------
    defaults = OrderedDict()
    bounds = OrderedDict()
    for rn, sn in zip(rate_names, source_names):
        defaults[rn] = 1.0
        bounds[rn] = lf.get_bounds(rn)
    shape_bounds_lo, shape_bounds_hi = [], []
    for sp, (anchors, _, base_value) in lf.shape_parameters.items():
        base_setting = lf.pdf_base_config.get(sp)
        defaults[sp] = float(base_setting
                             if isinstance(base_setting, (int, float))
                             else base_value)
        lo, hi = lf.get_bounds(sp)
        bounds[sp] = (lo, hi)
        shape_bounds_lo.append(lo)
        shape_bounds_hi.append(hi)
    shape_bounds_lo = jnp.asarray(np.array(shape_bounds_lo, dtype=float))
    shape_bounds_hi = jnp.asarray(np.array(shape_bounds_hi, dtype=float))

    base_livetime = lf.pdf_base_config.get('livetime_days', None)
    param_names = rate_names + shape_names
    if include_livetime:
        if not base_livetime:
            raise ValueError("Cannot expose livetime_days: base livetime is "
                             "absent or zero")
        defaults['livetime_days'] = float(base_livetime)
        bounds['livetime_days'] = (0.0, float('inf'))
        param_names = param_names + ['livetime_days']

    # -- priors ------------------------------------------------------------------
    prior_terms = []   # list of (param_name, callable)
    if with_priors:
        for sn in source_names:
            prior = lf.rate_parameters.get(sn)
            if prior is not None:
                _check_prior_traceable(sn + '_rate_multiplier', prior)
                prior_terms.append((sn + '_rate_multiplier', prior))
        for sp, (_, prior, _) in lf.shape_parameters.items():
            if prior is not None:
                _check_prior_traceable(sp, prior)
                prior_terms.append((sp, prior))

    # -- payload tensors -----------------------------------------------------------
    # Dedupe device uploads per host array: the big per-event/PMF anchor
    # tensor is converted both inside _compile_build's closure and for the
    # compiled.ps_tensor metadata — jnp.asarray would happily make a second
    # multi-GB device buffer from the same numpy array.
    _dev_seen = {}

    def _as_dev(x):
        hit = _dev_seen.get(id(x))
        if hit is not None and hit[0] is x:
            return hit[1]
        arr = jnp.asarray(x)
        if dtype is not None:
            arr = arr.astype(dtype)
        if isinstance(x, np.ndarray):
            _dev_seen[id(x)] = (x, arr)
        return arr

    def _compile_build(build, base_constant):
        """Return a pure function zs_vector -> payload array."""
        if build is None:
            const = _as_dev(base_constant)
            return lambda zs: const
        kind = build[0]
        if kind == 'constant':
            const = _as_dev(build[1])
            return lambda zs: const
        if kind == 'global':
            morpher, tensor = build[1], build[2]
            tensor = _as_dev(tensor)
            return lambda zs: morpher.jax_eval(tensor, zs)
        if kind == 'source_wise':
            sw = build[1]
            items = []
            for sn in source_names:
                morpher, tensor = sw[sn]
                items.append((morpher, _as_dev(tensor),
                              None if morpher is None
                              else tuple(lf._get_shape_indices(sn))))

            def eval_sw(zs):
                outs = []
                for morpher, tensor, idx in items:
                    if morpher is None:
                        outs.append(tensor)
                    else:
                        outs.append(morpher.jax_eval(
                            tensor, jnp.stack([zs[i] for i in idx])))
                return jnp.stack(outs)
            return eval_sw
        raise ValueError("Unknown build kind %r" % kind)

    mus_fn = _compile_build(lf._builds.get('mus'),
                            lf.base_model.expected_events())
    if 'ps' in lf._builds:
        ps_fn = _compile_build(lf._builds['ps'], None)
        ps_build_kind = lf._builds['ps'][0]
        _ps_morpher = (lf._builds['ps'][1]
                       if ps_build_kind == 'global' else None)
    elif not is_binned and not lf.is_data_set:
        # Data-free unbinned compile (for toy ensembles): densities will always
        # be supplied through logl_with_data.
        ps_fn = None
        if shape_names and not lf.source_wise_interpolation:
            ps_build_kind, _ps_morpher = 'global', lf.morpher
        elif not shape_names:
            ps_build_kind, _ps_morpher = 'constant', None
        else:
            ps_build_kind, _ps_morpher = 'source_wise', None
    else:
        raise RuntimeError(
            "No density payload available to compile: call set_data() first "
            "(unbinned) or prepare() (binned)")
    nme_fn = None
    if lf._builds.get('n_model_events') is not None:
        nme_fn = _compile_build(lf._builds['n_model_events'], None)

    # Morpher for externally supplied (toy) per-event ps tensors
    if ps_build_kind == 'global':
        def ps_override_fn(tensor, zs):
            return _ps_morpher.jax_eval(tensor, zs)
    elif ps_build_kind == 'constant':
        def ps_override_fn(tensor, zs):
            return tensor
    else:
        # Source-wise: the toy payload is a tuple of per-source anchor
        # tensors, each over that source's own (sub-)anchor grid; morph each
        # with its own morpher at its slice of zs and stack.
        sw_morph = []
        for sn in source_names:
            if sn in getattr(lf, 'source_morphers', {}):
                sw_morph.append((lf.source_morphers[sn],
                                 tuple(lf._get_shape_indices(sn))))
            else:
                sw_morph.append((None, None))

        def ps_override_fn(tensors, zs):
            outs = []
            for (morpher, idx), tensor in zip(sw_morph, tensors):
                if morpher is None:
                    outs.append(tensor)
                else:
                    outs.append(morpher.jax_eval(
                        tensor, jnp.stack([zs[i] for i in idx])))
            return jnp.stack(outs)

    # -- evaluation-time constants -----------------------------------------------
    allowed_negative = np.asarray(lf.source_allowed_negative, dtype=bool)
    any_allowed_negative = bool(allowed_negative.any())
    apply_eff = np.asarray(lf.source_apply_efficiency, dtype=bool)
    eff_names = list(lf.source_efficiency_names)
    outlier_likelihood = lf.config.get('outlier_likelihood', 1e-12)

    bb_source_i = None
    bb_lite = False
    if is_binned:
        _handling = getattr(lf, 'model_statistical_uncertainty_handling',
                            None)
        if _handling == 'bb_single':
            bb_source_i = lf.base_model.get_source_i(
                lf.config['bb_single_source'])
        elif _handling == 'bb_lite':
            bb_lite = True

    if is_binned:
        observed_data = (_as_dev(lf.data_events_per_bin.values)
                         if lf.is_data_set else None)
        event_mask = None
    else:
        observed_data = None
        event_mask = None   # closed-over ps tensors already match the data

    # -- the pure function ------------------------------------------------------------
    def _clipped_zs(params):
        """(zs_clipped, out_of_bounds): clamp for the interpolation so
        gradients stay finite; the -inf is applied by core's final where."""
        if not shape_names:
            return None, jnp.zeros((), dtype=bool)
        zs_raw = jnp.stack([jnp.asarray(params[sp]) for sp in shape_names])
        lo = shape_bounds_lo.astype(zs_raw.dtype)
        hi = shape_bounds_hi.astype(zs_raw.dtype)
        oob = jnp.any((zs_raw < lo) | (zs_raw > hi))
        return jnp.clip(zs_raw, lo, hi), oob

    def _mus_at(params, zs):
        """Per-source expected counts: base rates at zs, scaled by rate
        multipliers, joint livetime and applied efficiencies. ONE home for
        this pipeline — core() and the analytic engines' rates() must
        optimize/evaluate the same likelihood."""
        mus = mus_fn(zs)
        mults = jnp.stack([jnp.asarray(params[rn]) for rn in rate_names])
        mus = mus * mults.astype(mus.dtype)
        if include_livetime:
            mus = mus * (jnp.asarray(params['livetime_days'])
                         / base_livetime).astype(mus.dtype)
        if apply_eff.any():
            effs = [jnp.asarray(params[eff_names[i]])
                    if apply_eff[i] and eff_names[i] in shape_names
                    else jnp.ones(()) for i in range(n_sources)]
            mus = jnp.where(jnp.asarray(apply_eff),
                            mus * jnp.stack(effs).astype(mus.dtype), mus)
        return mus

    def core(params, data, mask, include_constant=True):
        penalty = jnp.zeros(())
        zs, oob = _clipped_zs(params)

        if is_binned or data is None:
            if ps_fn is None:
                raise RuntimeError(
                    "No density payload bound (data-free unbinned compile): "
                    "pass the toy anchor-ps tensor as `data` to "
                    "logl_with_data, or set_data() before compiling")
            ps = ps_fn(zs)
        else:
            # Toy path: `data` is an anchor-ps tensor with the same anchor-grid
            # layout as the build; morph it at zs.
            ps = ps_override_fn(data, zs)
        n_model_events = nme_fn(zs) if nme_fn is not None else None

        mus = _mus_at(params, zs)

        # Physicality policy (reference: blueice/likelihood.py:395-415)
        finite = jnp.all(mus < jnp.inf)
        if not any_allowed_negative:
            unphysical = ~(jnp.all(mus >= 0) & finite)
        else:
            per_source_bad = jnp.any((mus < 0)
                                     & ~jnp.asarray(allowed_negative))
            unphysical = (~finite) | (jnp.sum(mus) < 0) | per_source_bad
        # Clamp for downstream math; masked to -inf at the end
        mus_safe = (mus if any_allowed_negative
                    else jnp.maximum(mus, 0.0))

        if with_priors:
            for pname, prior in prior_terms:
                penalty = penalty + prior(jnp.asarray(params[pname]))

        if is_binned:
            pmfs = ps
            if bb_lite:
                ll = bb_lite_logl(mus_safe, pmfs, n_model_events, data,
                                  include_constant=include_constant)
            else:
                if bb_source_i is not None:
                    mus_safe, pmfs = bb_single_adjust(
                        mus_safe, pmfs, n_model_events, data, bb_source_i)
                ll = binned_poisson_logl(mus_safe, pmfs, data,
                                         include_constant=include_constant)
        else:
            ll = extended_logl(mus_safe, ps,
                               outlier_likelihood=outlier_likelihood,
                               mask=mask)

        ll = ll + penalty
        bad = oob | unphysical
        return jnp.where(bad, -jnp.inf, ll)

    if (is_binned and observed_data is None) or (not is_binned and ps_fn is None):
        def logl(params):
            raise RuntimeError("No data bound: call set_data() before "
                               "compiling, or use logl_with_data")
    else:
        def logl(params):
            return core(params, observed_data, event_mask)

    def logl_with_data(params, data, mask=None, include_constant=True):
        return core(params, data, mask, include_constant)

    def data_constant(data):
        """The parameter-independent part of logl(data): optimizers drop it
        inside their loops (loop-invariant) and add it back once."""
        if is_binned:
            return binned_poisson_logl_constant(data)
        return jnp.zeros(())

    def rates(params):
        """Per-source expected counts at params (after multipliers / livetime /
        efficiencies, before any Beeston-Barlow adjustment). This is the
        analytic engines' hot path — shares core()'s mu pipeline exactly."""
        return _mus_at(params, _clipped_zs(params)[0])

    def densities(params):
        """The morphed density payload at params: PMF grids
        (n_sources, *bins) for binned, per-event ps for unbinned."""
        if ps_fn is None:
            raise RuntimeError("No density payload bound (data-free unbinned "
                               "compile)")
        return ps_fn(_clipped_zs(params)[0])

    def expected_counts(params):
        """Expected counts per analysis-space bin at params (binned)."""
        mus = rates(params)
        return jnp.tensordot(mus, densities(params), axes=(0, 0))

    compiled = CompiledLogLikelihood(logl, logl_with_data, param_names,
                                     defaults, bounds, observed_data, lf)
    compiled.rates = rates
    compiled.densities = densities
    compiled.expected_counts = expected_counts
    compiled.data_constant = data_constant
    compiled.is_binned = is_binned
    compiled.dtype = dtype
    # Metadata for the analytic (closed-form derivative) fit engine
    compiled.shape_names = shape_names
    compiled.rate_names = rate_names
    compiled.has_bb = bb_source_i is not None
    compiled.has_bb_lite = bb_lite
    compiled.prior_terms = prior_terms
    compiled.outlier_likelihood = outlier_likelihood
    # _host twins keep the numpy payloads around so engine setup (e.g. the
    # Pallas kernels' pad_bins) never round-trips multi-MB tensors back from
    # the device — a d2h pull through the remote-TPU tunnel costs minutes
    # when the link is degraded
    def _np_host(x):
        x = np.asarray(x)
        return x.astype(np.dtype(dtype)) if dtype is not None else x

    # Log (geometric) template morphing wraps the dense-grid morpher; the
    # anchor grid lives on the INNER morpher and the published ps_tensor is
    # the LOG anchor tensor — compiled.log_morph tells the closed-form
    # engines to carry the exp/mass-rescale chain (ops.binned_vgh_log)
    from .morphers import LogMorpher
    _ps_inner = (_ps_morpher.inner
                 if isinstance(_ps_morpher, LogMorpher) else _ps_morpher)
    compiled.log_morph = isinstance(_ps_morpher, LogMorpher)
    if ('ps' in lf._builds and ps_build_kind == 'global'
            and hasattr(_ps_inner, 'anchor_z_arrays')):
        compiled.ps_tensor = _as_dev(lf._builds['ps'][2])
        compiled.ps_tensor_host = _np_host(lf._builds['ps'][2])
        compiled.anchor_arrays = [np.asarray(a, dtype=float)
                                  for a in _ps_inner.anchor_z_arrays]
    elif ps_build_kind == 'constant' and 'ps' in lf._builds:
        compiled.ps_tensor = _as_dev(lf._builds['ps'][1])
        compiled.ps_tensor_host = _np_host(lf._builds['ps'][1])
        compiled.anchor_arrays = []
    elif (ps_build_kind == 'global'
          and hasattr(_ps_morpher, 'anchor_z_arrays')):
        # Data-free unbinned compile: no density payload yet, but the anchor
        # grid is known — enough for the analytic engine to fit runtime
        # (toy) density tensors
        compiled.ps_tensor = None
        compiled.anchor_arrays = [np.asarray(a, dtype=float)
                                  for a in _ps_morpher.anchor_z_arrays]
    elif ps_build_kind == 'constant':
        compiled.ps_tensor = None
        compiled.anchor_arrays = []
    else:
        compiled.ps_tensor = None
        compiled.anchor_arrays = None
    if compiled.ps_tensor is None:
        compiled.ps_tensor_host = None
    # n_model_events tensor on the same anchor layout (the fast Beeston-Barlow
    # engine needs it alongside ps_tensor)
    compiled.bb_source_i = bb_source_i
    nme_build = lf._builds.get('n_model_events')
    if (compiled.ps_tensor is not None and nme_build is not None
            and nme_build[0] == ps_build_kind):
        nme_np = nme_build[2] if ps_build_kind == 'global' else nme_build[1]
        compiled.nme_tensor = _as_dev(nme_np)
        compiled.nme_tensor_host = _np_host(nme_np)
    else:
        compiled.nme_tensor = None
        compiled.nme_tensor_host = None
    return compiled
